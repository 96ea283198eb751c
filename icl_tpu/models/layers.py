"""Shared layer utilities: torch-compatible initializers and norms.

The reference relies on torch default initializers (kaiming_uniform with
a=√5 for Conv/Linear kernels + matching uniform bias — effectively
U(−1/√fan_in, 1/√fan_in)). Flax defaults (lecun_normal) would change
training dynamics, so we reproduce the torch scheme for parity.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _uniform(key, shape, dtype, bound):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/√fan_in, 1/√fan_in) for flax Conv kernels (*k, cin, cout) and
    Dense kernels (cin, cout) — torch kaiming_uniform(a=√5)."""
    fan_in = math.prod(shape[:-1])
    return _uniform(key, shape, dtype, 1.0 / math.sqrt(fan_in))


def torch_transpose_kernel_init(key, shape, dtype=jnp.float32):
    """torch ConvTranspose weight is (cin, cout, *k) with fan_in =
    cout·∏k; flax kernel is (*k, cin, cout)."""
    k_prod = math.prod(shape[:-2])
    fan_in = shape[-1] * k_prod
    return _uniform(key, shape, dtype, 1.0 / math.sqrt(fan_in))


def make_torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return _uniform(key, shape, dtype, bound)

    return init


class TorchConv(nn.Module):
    """nn.Conv with torch-default init. kernel_size is a tuple."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    padding: str | int = 0
    use_bias: bool = True
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        fan_in = (cin // self.feature_group_count) * math.prod(self.kernel_size)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * len(self.kernel_size)
        return nn.Conv(
            self.features,
            tuple(self.kernel_size),
            strides=self.strides,
            padding=pad,
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_init=torch_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
        )(x)


class TorchConvTranspose(nn.Module):
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = self.features * math.prod(self.kernel_size)
        return nn.ConvTranspose(
            self.features,
            tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=torch_transpose_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
        )(x)


class TorchDense(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm matching torch defaults: eps 1e-5, momentum 0.1
    (flax momentum = 0.9), affine, running stats tracked."""

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )(x)


class LayerNorm(nn.Module):
    """LayerNorm with torch eps 1e-5 over the last axis."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5)(x)


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample.

    Matches monai/timm DropPath used by the reference Class_Decoder
    (unet_icl.py:349): scale by 1/(1-p), per-sample Bernoulli over the
    leading axis, identity in eval.
    """

    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


def _align_corners_matrix(n_in: int, n_out: int):
    """Row-stochastic (n_out, n_in) linear-interpolation matrix for the
    torch align_corners=True grid: out[i] samples at i·(n_in−1)/(n_out−1)."""
    import numpy as np

    if n_in == 1 or n_out == 1:
        M = np.zeros((n_out, n_in), np.float32)
        M[:, 0] = 1.0
        return M
    s = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    j0 = np.floor(s).astype(np.int64)
    w = (s - j0).astype(np.float32)
    j1 = np.minimum(j0 + 1, n_in - 1)
    M = np.zeros((n_out, n_in), np.float32)
    np.add.at(M, (np.arange(n_out), j0), 1.0 - w)
    np.add.at(M, (np.arange(n_out), j1), w)
    return M


def upsample_align_corners(x: jax.Array, factor: int = 2) -> jax.Array:
    """torch nn.Upsample(scale_factor=f, mode='bilinear'/'trilinear',
    align_corners=True) for channel-last x — the upsampling the reference
    2D decoders actually use (unet.py:74-76; the ConvTranspose branch is
    unreachable, see UpBlock note in unet2d.py).

    align_corners=True is NOT expressible with jax.image.resize (which
    implements half-pixel centers), so interpolate separably per axis as
    small static matmuls — MXU-friendly and fusable."""
    for axis in range(1, x.ndim - 1):
        n_in = x.shape[axis]
        M = jnp.asarray(_align_corners_matrix(n_in, n_in * factor), dtype=x.dtype)
        x = jnp.moveaxis(jnp.tensordot(M, x, axes=(1, axis)), 0, axis)
    return x


def max_pool(x: jax.Array, window: int = 2) -> jax.Array:
    """MaxPool(k=stride=window) over all spatial dims of channel-last x."""
    n_spatial = x.ndim - 2
    dims = (window,) * n_spatial
    return nn.max_pool(x, dims, strides=dims)


def gelu_exact(x: jax.Array) -> jax.Array:
    """torch nn.GELU default (exact erf formulation)."""
    return jax.nn.gelu(x, approximate=False)
