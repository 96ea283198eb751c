"""Device-side augmentations: the reference's host scipy pipeline
(rot90/flip, ±20° order-0 rotate, order-0 zoom — dataset.py:75-166)
re-expressed as one jitted batch program, so augmentation runs on the
TPU's VPU instead of the single host core (BASELINE.json north star).

Semantics match the host path:
  * 50% rot90(k∈0..3)+flip(axis∈{0,1}), elif 25% rotate(angle∈[-20,20),
    nearest, reshape=False, constant 0 outside) — per sample.
  * order-0 zoom to the patch size with scipy's index mapping
    (grid_mode=False: in_idx = round(out_idx / zoom)).

Inputs are raw same-size slices [B, S, S]; outputs [B, P, P]. The host
pipeline remains the default (identical RNG path to the reference);
this is the high-throughput alternative for when the host core is the
bottleneck.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _zoom_indices(in_size: int, out_size: int) -> jnp.ndarray:
    """scipy.ndimage.zoom(order=0, grid_mode=False) index map: endpoints
    aligned, in_idx = round(out_idx · (in−1)/(out−1))."""
    if out_size == 1:
        return jnp.zeros((1,), jnp.int32)
    ratio = (in_size - 1) / (out_size - 1)
    idx = jnp.floor(jnp.arange(out_size) * ratio + 0.5).astype(jnp.int32)
    return jnp.clip(idx, 0, in_size - 1)


def zoom_nearest(img: jax.Array, out_size: int) -> jax.Array:
    """Order-0 zoom of [..., S, S] to [..., out, out]."""
    s = img.shape[-1]
    idx = _zoom_indices(s, out_size)
    return img[..., idx, :][..., :, idx]


def _rotate_nearest(img: jax.Array, angle_deg: jax.Array) -> jax.Array:
    """ndimage.rotate(order=0, reshape=False, cval=0) for a square image:
    output(o) = input(R(o - c) + c) with nearest rounding."""
    s = img.shape[-1]
    c = (s - 1) / 2.0
    theta = -angle_deg * jnp.pi / 180.0  # scipy rotates CCW in array space
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    yy, xx = jnp.meshgrid(jnp.arange(s) - c, jnp.arange(s) - c, indexing="ij")
    src_y = cos * yy - sin * xx + c
    src_x = sin * yy + cos * xx + c
    iy = jnp.floor(src_y + 0.5).astype(jnp.int32)
    ix = jnp.floor(src_x + 0.5).astype(jnp.int32)
    # scipy validity rule: UNROUNDED coordinate within [0, size-1]
    valid = (src_y >= 0) & (src_y <= s - 1) & (src_x >= 0) & (src_x <= s - 1)
    iy = jnp.clip(iy, 0, s - 1)
    ix = jnp.clip(ix, 0, s - 1)
    out = img[..., iy, ix]
    return jnp.where(valid, out, jnp.zeros_like(out))


def _augment_one(img, lab, key, out_size: int):
    k_branch, k_rot90, k_axis, k_angle, k_u2 = jax.random.split(key, 5)
    u1 = jax.random.uniform(k_branch)
    u2 = jax.random.uniform(k_u2)

    def rot_flip(img, lab):
        k = jax.random.randint(k_rot90, (), 0, 4)
        axis = jax.random.randint(k_axis, (), 0, 2)
        def rf(x):
            x = jax.lax.switch(k, [
                lambda a: a,
                lambda a: jnp.rot90(a, 1),
                lambda a: jnp.rot90(a, 2),
                lambda a: jnp.rot90(a, 3),
            ], x)
            return jax.lax.cond(axis == 0, lambda a: jnp.flip(a, 0),
                                lambda a: jnp.flip(a, 1), x)
        return rf(img), rf(lab)

    def rotate(img, lab):
        angle = jax.random.randint(k_angle, (), -20, 20).astype(jnp.float32)
        return (_rotate_nearest(img, angle),
                _rotate_nearest(lab.astype(jnp.float32), angle).astype(lab.dtype))

    def maybe_rotate(ops):
        img, lab = ops
        return jax.lax.cond(u2 > 0.5, lambda o: rotate(*o), lambda o: o, (img, lab))

    img, lab = jax.lax.cond(
        u1 > 0.5, lambda o: rot_flip(*o), maybe_rotate, (img, lab)
    )
    img = zoom_nearest(img, out_size)
    lab = zoom_nearest(lab, out_size)
    return img, lab


@partial(jax.jit, static_argnames=("out_size",))
def augment_batch(images: jax.Array, labels: jax.Array, key: jax.Array,
                  out_size: int):
    """RandomGenerator-equivalent for a batch of same-size square slices.
    images [B, S, S] float32, labels [B, S, S] int → ([B, out, out, 1],
    [B, out, out])."""
    keys = jax.random.split(key, images.shape[0])
    img, lab = jax.vmap(lambda i, l, k: _augment_one(i, l, k, out_size))(
        images, labels, keys
    )
    return img[..., None], lab
