"""convert_swinunet2d coverage: the ImageNet-Swin dialect (after
encoder→decoder mirroring) must populate every encoder block + mirrored
decoder block + patch-embed + downsample leaf of a real SwinUNet2D tree
with correct shapes (heads/tables that differ in shape are pruned by the
loader, as the reference does)."""
import pytest

# slow tier: excluded from the quick gate (pytest.ini)
pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from icl_tpu.models.swin2d import SwinConfig, SwinUNet2D
from icl_tpu.utils import torch_import as ti


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def test_swinunet2d_converter_covers_encoder_and_decoder():
    cfg = SwinConfig(img_size=32, window_size=4, embed_dim=12)
    m = SwinUNet2D(num_classes=4, cfg=cfg)
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               jnp.zeros((1, 32, 32, 3)), train=False)
    flat = _flatten(v["params"])

    # build a fake ImageNet-Swin state_dict for the ENCODER only; the
    # remap mirrors it into the decoder keys
    rng = np.random.default_rng(0)
    sd = {}
    depths = cfg.depths
    for li, depth in enumerate(depths):
        dim = cfg.embed_dim * 2**li
        for b in range(depth):
            t = f"layers.{li}.blocks.{b}"
            sd[f"{t}.norm1.weight"] = rng.normal(size=(dim,)).astype(np.float32)
            sd[f"{t}.norm1.bias"] = rng.normal(size=(dim,)).astype(np.float32)
            sd[f"{t}.norm2.weight"] = rng.normal(size=(dim,)).astype(np.float32)
            sd[f"{t}.norm2.bias"] = rng.normal(size=(dim,)).astype(np.float32)
            nH = cfg.num_heads[li]
            sd[f"{t}.attn.relative_position_bias_table"] = rng.normal(
                size=((2 * cfg.window_size - 1) ** 2, nH)).astype(np.float32)
            sd[f"{t}.attn.qkv.weight"] = rng.normal(size=(3 * dim, dim)).astype(np.float32)
            sd[f"{t}.attn.qkv.bias"] = rng.normal(size=(3 * dim,)).astype(np.float32)
            sd[f"{t}.attn.proj.weight"] = rng.normal(size=(dim, dim)).astype(np.float32)
            sd[f"{t}.attn.proj.bias"] = rng.normal(size=(dim,)).astype(np.float32)
            sd[f"{t}.mlp.fc1.weight"] = rng.normal(size=(4 * dim, dim)).astype(np.float32)
            sd[f"{t}.mlp.fc1.bias"] = rng.normal(size=(4 * dim,)).astype(np.float32)
            sd[f"{t}.mlp.fc2.weight"] = rng.normal(size=(dim, 4 * dim)).astype(np.float32)
            sd[f"{t}.mlp.fc2.bias"] = rng.normal(size=(dim,)).astype(np.float32)
        if li < len(depths) - 1:
            sd[f"layers.{li}.downsample.reduction.weight"] = rng.normal(
                size=(2 * dim, 4 * dim)).astype(np.float32)
            sd[f"layers.{li}.downsample.norm.weight"] = rng.normal(size=(4 * dim,)).astype(np.float32)
            sd[f"layers.{li}.downsample.norm.bias"] = rng.normal(size=(4 * dim,)).astype(np.float32)
    sd["patch_embed.proj.weight"] = rng.normal(
        size=(cfg.embed_dim, 3, cfg.patch_size, cfg.patch_size)).astype(np.float32)
    sd["patch_embed.proj.bias"] = rng.normal(size=(cfg.embed_dim,)).astype(np.float32)
    sd["norm.weight"] = rng.normal(size=(cfg.embed_dim * 8,)).astype(np.float32)
    sd["norm.bias"] = rng.normal(size=(cfg.embed_dim * 8,)).astype(np.float32)
    sd["head.weight"] = rng.normal(size=(1000, 8 * cfg.embed_dim)).astype(np.float32)

    remapped = ti.imagenet_swin_remap(sd)
    assert "head.weight" not in remapped
    sub = ti.convert_swinunet2d(remapped, depths=cfg.depths)
    conv_flat = _flatten(sub)

    # every converted leaf must exist in the model tree; shape mismatches
    # are legal ONLY for relative-position tables of shrunk-window blocks
    # (the loader prunes them, reference strict=False semantics)
    for path, val in conv_flat.items():
        assert path in flat, path
        if val.shape != flat[path].shape:
            assert path[-1] == "relative_position_bias_table", (
                path, val.shape, flat[path].shape
            )

    # coverage: all encoder attn/mlp leaves present
    want_prefixes = [p for p in flat
                     if p[0].startswith("layers") and not p[0].startswith("layers_up")
                     and "drop_path" not in p]
    missing = [p for p in want_prefixes if p not in conv_flat]
    assert not missing, missing[:5]
    # decoder mirroring: layers_up blocks (i>0) covered too
    dec = [p for p in conv_flat if p[0].startswith("layers_up")]
    assert dec, "decoder mirror produced no leaves"
