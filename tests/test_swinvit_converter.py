"""convert_swinvit3d structural coverage: every Dense/LayerNorm/bias-
table/patch-embed leaf of a real SwinViT3D tree is produced by the
converter with the right shape — including the nn.scan STACKED per-stage
block layout (layers{i}_blocks/blocks/... with a leading block axis)."""
import pytest

# slow tier: excluded from the quick gate (pytest.ini)
pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from icl_tpu.models.swinunetr import SwinViT3D
from icl_tpu.utils import torch_import as ti

DEPTHS = (2, 2, 2, 2)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _block_torch_keys(path):
    """Stacked flax path under layers{i}_blocks/blocks -> list of
    per-block SSL-dialect torch keys (leading axis = block index)."""
    layer = path[0].split("_")[0]  # layers1
    t_layer = f"{layer}.0"
    depth = DEPTHS[int(layer[len("layers"):]) - 1]
    rest = path[2:]
    leaf = {"kernel": "weight", "scale": "weight", "bias": "bias"}.get(path[-1])
    keys = []
    for b in range(depth):
        t = f"{t_layer}.blocks.{b}"
        if rest[0] in ("norm1", "norm2"):
            keys.append(f"{t}.{rest[0]}.{leaf}")
        elif rest == ("attn", "relative_position_bias_table"):
            keys.append(f"{t}.attn.relative_position_bias_table")
        elif rest[0] == "attn":
            keys.append(f"{t}.attn.{rest[1]}.{leaf}")
        elif rest[0] in ("mlp_linear1", "mlp_linear2"):
            fc = "fc1" if rest[0].endswith("1") else "fc2"
            keys.append(f"{t}.mlp.{fc}.{leaf}")
        else:
            raise KeyError(path)
    return keys


def _torch_key(path):
    """Unstacked flax path -> SSL-dialect torch key."""
    if path[0] == "patch_embed_proj":
        return "patch_embed.proj." + ("weight" if path[-1] == "kernel" else "bias")
    layer, sub = path[0].split("_", 1)
    t_layer = f"{layer}.0"
    leaf = {"kernel": "weight", "scale": "weight", "bias": "bias"}[path[-1]]
    assert sub == "downsample", path
    if path[1] == "reduction":
        return f"{t_layer}.downsample.reduction.weight"
    return f"{t_layer}.downsample.norm.{leaf}"


def test_swinvit3d_converter_full_coverage():
    m = SwinViT3D(in_chans=1, embed_dim=12, depths=DEPTHS,
                  num_heads=(2, 2, 2, 2), window_size=(2, 2, 2))
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               jnp.zeros((1, 32, 32, 32, 1)), train=False)
    flat = _flatten(v["params"])

    rng = np.random.default_rng(0)
    sd = {}
    for path, ref in flat.items():
        if len(path) > 1 and path[1] == "blocks":
            # stacked leaf: one torch key per block, unstacked shape
            for b, t_key in enumerate(_block_torch_keys(path)):
                shape = ref.shape[1:]
                if path[-1] == "kernel":
                    shape = shape[::-1]  # linear
                sd[t_key] = rng.normal(size=shape).astype(np.float32)
            continue
        t_key = _torch_key(path)
        if path[-1] == "kernel" and "patch_embed" in path[0]:
            shape = (ref.shape[-1], ref.shape[-2]) + ref.shape[:-2]  # conv
        elif path[-1] == "kernel":
            shape = ref.shape[::-1]  # linear
        else:
            shape = ref.shape
        sd[t_key] = rng.normal(size=shape).astype(np.float32)

    converted = _flatten(ti.convert_swinvit3d(sd))
    missing = set(flat) - set(converted)
    assert not missing, sorted(missing)[:5]
    for path, val in converted.items():
        assert val.shape == flat[path].shape, path

    # round-trip spot check: stacked block b of qkv equals its torch key
    p = ("layers1_blocks", "blocks", "attn", "qkv", "Dense_0", "kernel")
    for b in range(DEPTHS[0]):
        np.testing.assert_array_equal(
            converted[p][b], sd[f"layers1.0.blocks.{b}.attn.qkv.weight"].T
        )


def test_ssl_fixup_prefixes():
    sd = {"module.swin_vit.layers1.0.blocks.0.mlp.linear1.weight": np.ones(2)}
    out = ti.ssl_swinvit_fixup(sd)
    assert "layers1.0.blocks.0.mlp.fc1.weight" in out
