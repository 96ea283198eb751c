"""SSL baseline U-Net variants (reference `code/networks/unet.py:157-391`).

UNet_CCT (multi-decoder consistency), UNet_URPC (uncertainty-rectified
pyramid consistency with feature perturbations), UNet_DS (deep
supervision). The reference keeps these unreachable from its factory
(net_factory.py:78-89 exposes only unet/swinunet/icl_*); they are
provided here for full component parity and ARE registered (keys
unet_cct / unet_urpc / unet_ds).

Perturbations (unet.py:273-302):
  Dropout(p=.3), FeatureDropout (threshold channel-mean attention at a
  random 0.7-0.9 fraction of its max), FeatureNoise (±0.3 uniform
  multiplicative noise).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from icl_tpu.models.layers import TorchConv
from icl_tpu.models.unet2d import DEFAULT_FEATURES, Encoder, UpBlock


def feature_dropout(x: jax.Array, rng: jax.Array) -> jax.Array:
    """FeatureDropout (unet.py:278-286): zero positions whose channel-mean
    attention exceeds a random 0.7-0.9 fraction of its per-sample max."""
    attention = jnp.mean(x, axis=-1, keepdims=True)
    max_val = jnp.max(attention.reshape(x.shape[0], -1), axis=1)
    frac = jax.random.uniform(rng, (), minval=0.7, maxval=0.9)
    threshold = (max_val * frac).reshape(-1, 1, 1, 1)
    drop_mask = (attention < threshold).astype(x.dtype)
    return x * drop_mask


def feature_noise(x: jax.Array, rng: jax.Array, uniform_range: float = 0.3) -> jax.Array:
    """FeatureNoise (unet.py:289-302): x·U(-r, r) + x with noise shared
    across the batch (sampled for shape x[1:])."""
    noise = jax.random.uniform(
        rng, x.shape[1:], minval=-uniform_range, maxval=uniform_range
    )[None]
    return x * noise + x


def dropout_perturb(x: jax.Array, rng: jax.Array, p: float = 0.3) -> jax.Array:
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


class _Decoder(nn.Module):
    """Plain decoder re-declared locally so the variants can own
    independently-initialized copies."""

    class_num: int
    features: Sequence[int] = DEFAULT_FEATURES

    @nn.compact
    def __call__(self, feature, *, train: bool):
        x0, x1, x2, x3, x4 = feature
        ft = self.features
        x = UpBlock(ft[3], ft[3], name="up1")(x4, x3, train=train)
        x = UpBlock(ft[2], ft[2], name="up2")(x, x2, train=train)
        x = UpBlock(ft[1], ft[1], name="up3")(x, x1, train=train)
        x = UpBlock(ft[0], ft[0], name="up4")(x, x0, train=train)
        return TorchConv(self.class_num, (3, 3), padding=1, name="out_conv")(x)


class UNetCCT(nn.Module):
    """UNet_CCT (unet.py:324-349): shared encoder, one main + three
    perturbed auxiliary decoders."""

    in_chns: int
    class_num: int

    @nn.compact
    def __call__(self, x, *, train: bool = False, inference: bool = False):
        feature = Encoder(self.in_chns, name="encoder")(x, train=train)
        main_seg = _Decoder(self.class_num, name="main_decoder")(feature, train=train)
        if inference or not train:
            return main_seg
        rng = self.make_rng("dropout")
        r1, r2, r3 = jax.random.split(rng, 3)
        aux1 = [feature_noise(f, jax.random.fold_in(r1, i)) for i, f in enumerate(feature)]
        aux2 = [dropout_perturb(f, jax.random.fold_in(r2, i)) for i, f in enumerate(feature)]
        aux3 = [feature_dropout(f, jax.random.fold_in(r3, i)) for i, f in enumerate(feature)]
        aux_seg1 = _Decoder(self.class_num, name="aux_decoder1")(aux1, train=train)
        aux_seg2 = _Decoder(self.class_num, name="aux_decoder2")(aux2, train=train)
        aux_seg3 = _Decoder(self.class_num, name="aux_decoder3")(aux3, train=train)
        return main_seg, aux_seg1, aux_seg2, aux_seg3


class _DecoderDS(nn.Module):
    """Decoder_DS / Decoder_URPC (unet.py:157-270): per-stage 3×3 heads
    interpolated to full resolution; URPC perturbs stage features in
    train mode."""

    class_num: int
    urpc: bool = False
    features: Sequence[int] = DEFAULT_FEATURES

    @nn.compact
    def __call__(self, feature, shape, *, train: bool):
        x0, x1, x2, x3, x4 = feature
        ft = self.features

        def head(x, name):
            return TorchConv(self.class_num, (3, 3), padding=1, name=name)(x)

        def up_to_full(seg):
            out_shape = (seg.shape[0], *shape, seg.shape[-1])
            # torch F.interpolate default mode='nearest' (unet.py:195)
            return jax.image.resize(seg, out_shape, method="nearest")

        rng = self.make_rng("dropout") if (train and self.urpc) else None

        x = UpBlock(ft[3], ft[3], name="up1")(x4, x3, train=train)
        h3 = dropout_perturb(x, jax.random.fold_in(rng, 3), 0.5) if rng is not None else x
        dp3 = up_to_full(head(h3, "out_conv_dp3"))
        x = UpBlock(ft[2], ft[2], name="up2")(x, x2, train=train)
        h2 = feature_dropout(x, jax.random.fold_in(rng, 2)) if rng is not None else x
        dp2 = up_to_full(head(h2, "out_conv_dp2"))
        x = UpBlock(ft[1], ft[1], name="up3")(x, x1, train=train)
        h1 = feature_noise(x, jax.random.fold_in(rng, 1)) if rng is not None else x
        dp1 = up_to_full(head(h1, "out_conv_dp1"))
        x = UpBlock(ft[0], ft[0], name="up4")(x, x0, train=train)
        dp0 = head(x, "out_conv")
        return dp0, dp1, dp2, dp3


class UNetURPC(nn.Module):
    """UNet_URPC (unet.py:352-370)."""

    in_chns: int
    class_num: int

    @nn.compact
    def __call__(self, x, *, train: bool = False, inference: bool = False):
        shape = x.shape[1:-1]
        feature = Encoder(self.in_chns, name="encoder")(x, train=train)
        return _DecoderDS(self.class_num, urpc=True, name="decoder")(
            feature, shape, train=train
        )


class UNetDS(nn.Module):
    """UNet_DS (unet.py:373-391)."""

    in_chns: int
    class_num: int

    @nn.compact
    def __call__(self, x, *, train: bool = False, inference: bool = False):
        shape = x.shape[1:-1]
        feature = Encoder(self.in_chns, name="encoder")(x, train=train)
        return _DecoderDS(self.class_num, urpc=False, name="decoder")(
            feature, shape, train=train
        )
