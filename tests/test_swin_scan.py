"""SwinStage3D (nn.scan, stacked params) must match the unrolled
SwinBlock3D sequence bit-for-intent: same weights (stacked vs per-block)
→ same output in eval mode, shifted and unshifted blocks included
(VERDICT r1 item 2 — the scan exists to cut compile time, not to change
math)."""
import pytest

# slow tier: excluded from the quick gate (pytest.ini)
pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from icl_tpu.models.swinunetr import SwinBlock3D, SwinStage3D, SwinViT3D


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def test_scan_stage_matches_unrolled_blocks():
    dim, heads, depth = 12, 2, 2
    ws = (4, 4, 4)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 8, 8, 8, dim)).astype(np.float32)
    )

    stage = SwinStage3D(dim, depth, heads, ws, drop_paths=(0.0, 0.1))
    v = stage.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y_scan = stage.apply(v, x, train=False)

    # rebuild the unrolled blocks from the stacked params
    stacked = _flatten(v["params"]["blocks"])
    y = x
    for b in range(depth):
        blk_params = _unflatten({p: val[b] for p, val in stacked.items()})
        shift = (0, 0, 0) if b % 2 == 0 else tuple(w // 2 for w in ws)
        blk = SwinBlock3D(dim, heads, ws, shift, drop_path=[0.0, 0.1][b])
        y = blk.apply({"params": blk_params}, y, train=False)

    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y),
                               atol=2e-5, rtol=1e-5)


def test_scan_stage_window_shrink_path():
    """Stage dims ≤ window → per-dim shrink, no shift, zero masks."""
    dim, heads = 8, 2
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 2, 2, 2, dim)).astype(np.float32)
    )
    stage = SwinStage3D(dim, 2, heads, (7, 7, 7))
    v = stage.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y = stage.apply(v, x, train=False)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


def test_swinvit3d_emits_five_scales():
    m = SwinViT3D(in_chans=1, embed_dim=12, depths=(2, 2, 2, 2),
                  num_heads=(2, 2, 2, 2), window_size=(2, 2, 2))
    x = jnp.zeros((1, 32, 32, 32, 1))
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               x, train=False)
    outs = m.apply(v, x, train=False)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 1]
    # stacked layout: stage params carry the leading block axis
    qkv = v["params"]["layers1_blocks"]["blocks"]["attn"]["qkv"]["Dense_0"]["kernel"]
    assert qkv.shape[0] == 2
