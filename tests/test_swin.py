"""Swin building blocks: window round-trips, rel-pos index vs torch
formula, shift-mask parity, model shapes (small configs)."""
import pytest

# slow tier: excluded from the quick gate (pytest.ini)
pytestmark = pytest.mark.slow

import numpy as np
import torch

import jax
import jax.numpy as jnp

from icl_tpu.models.swin2d import (
    relative_position_index_2d,
    shifted_window_mask,
    window_partition,
    window_reverse,
)
from icl_tpu.models.swinunetr import (
    compute_mask_3d,
    relative_position_index_3d,
    window_partition_3d,
    window_reverse_3d,
)


def test_window_roundtrip_2d():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)), jnp.float32)
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 3)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_window_roundtrip_3d():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, 4, 3)), jnp.float32)
    w = window_partition_3d(x, (2, 2, 2))
    assert w.shape == (2 * 8, 8, 3)
    back = window_reverse_3d(w, (2, 2, 2), (2, 4, 4, 4))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def torch_rpi_2d(ws):
    """Reference formula (swinunet_icl.py:95-112)."""
    coords = torch.stack(torch.meshgrid(
        [torch.arange(ws), torch.arange(ws)], indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1).numpy()


def test_relative_position_index_2d_matches_torch():
    for ws in (2, 4, 7):
        np.testing.assert_array_equal(relative_position_index_2d(ws), torch_rpi_2d(ws))


def torch_rpi_3d(ws):
    """Reference formula (swinunetr.py:414-436)."""
    coords = torch.stack(torch.meshgrid(
        [torch.arange(w) for w in ws], indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    for i in range(3):
        rel[:, :, i] += ws[i] - 1
    rel[:, :, 0] *= (2 * ws[1] - 1) * (2 * ws[2] - 1)
    rel[:, :, 1] *= 2 * ws[2] - 1
    return rel.sum(-1).numpy()


def test_relative_position_index_3d_matches_torch():
    np.testing.assert_array_equal(
        relative_position_index_3d((3, 3, 3)), torch_rpi_3d((3, 3, 3))
    )
    np.testing.assert_array_equal(
        relative_position_index_3d((2, 3, 4)), torch_rpi_3d((2, 3, 4))
    )


def torch_shift_mask_2d(H, W, ws, shift):
    """Reference formula (swinunet_icl.py:222-245)."""
    img_mask = torch.zeros((1, H, W, 1))
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for h in slices:
        for w in slices:
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mw = img_mask.view(1, H // ws, ws, W // ws, ws, 1)
    mw = mw.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn = mw.unsqueeze(1) - mw.unsqueeze(2)
    attn = attn.masked_fill(attn != 0, -100.0).masked_fill(attn == 0, 0.0)
    return attn.numpy()


def test_shift_mask_2d_matches_torch():
    got = shifted_window_mask(8, 8, 4, 2)
    want = torch_shift_mask_2d(8, 8, 4, 2)
    np.testing.assert_array_equal(got, want)


def test_shift_mask_3d_zero_shift_is_none():
    assert compute_mask_3d((4, 4, 4), (2, 2, 2), (0, 0, 0)) is None
    m = compute_mask_3d((4, 4, 4), (2, 2, 2), (1, 1, 1))
    assert m is not None and m.shape == (8, 8, 8)


def test_swinunet_shapes():
    from icl_tpu.models.registry import net_factory

    m = net_factory("swinunet", 1, 4, img_size=32, window_size=4)
    x = jnp.zeros((1, 32, 32, 1))
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
               x, train=True)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 32, 32, 4)


def test_swinunetr_shapes():
    from icl_tpu.models.registry import net_factory

    m = net_factory("swinunetr", 1, 2, feature_size=12, window_size=(4, 4, 4))
    x = jnp.zeros((1, 32, 32, 32, 1))
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
               x, train=True)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 32, 32, 32, 2)
