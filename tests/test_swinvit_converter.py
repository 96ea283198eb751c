"""convert_swinvit3d structural coverage: every Dense/LayerNorm/bias-
table/patch-embed leaf of a real SwinViT3D tree is produced by the
converter with the right shape."""
import numpy as np

import jax
import jax.numpy as jnp

from icl_tpu.models.swinunetr import SwinViT3D
from icl_tpu.utils import torch_import as ti


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _torch_key(path):
    """flax path -> SSL-dialect torch key (inverse of convert_swinvit3d)."""
    name = "/".join(path)
    if path[0] == "patch_embed_proj":
        return "patch_embed.proj." + ("weight" if path[-1] == "kernel" else "bias")
    mod = path[0]  # e.g. layers1_block0 / layers1_downsample
    layer, sub = mod.split("_", 1)
    t_layer = f"{layer}.0"
    if path[-1] == "relative_position_bias_table":
        b = sub[len("block"):]
        return f"{t_layer}.blocks.{b}.attn.relative_position_bias_table"
    leaf = {"kernel": "weight", "scale": "weight", "bias": "bias"}[path[-1]]
    if sub.startswith("block"):
        b = sub[len("block"):]
        rest = path[1]
        if rest in ("norm1", "norm2"):
            return f"{t_layer}.blocks.{b}.{rest}.{leaf}"
        if rest == "attn":
            if path[2] == "relative_position_bias_table":
                return f"{t_layer}.blocks.{b}.attn.relative_position_bias_table"
            return f"{t_layer}.blocks.{b}.attn.{path[2]}.{leaf}"
        if rest in ("mlp_linear1", "mlp_linear2"):
            fc = "fc1" if rest.endswith("1") else "fc2"
            return f"{t_layer}.blocks.{b}.mlp.{fc}.{leaf}"
    if sub == "downsample":
        if path[1] == "reduction":
            return f"{t_layer}.downsample.reduction.weight"
        return f"{t_layer}.downsample.norm.{leaf}"
    raise KeyError(name)


def test_swinvit3d_converter_full_coverage():
    m = SwinViT3D(in_chans=1, embed_dim=12, depths=(2, 2, 2, 2),
                  num_heads=(2, 2, 2, 2), window_size=(2, 2, 2))
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               jnp.zeros((1, 32, 32, 32, 1)), train=False)
    flat = _flatten(v["params"])

    rng = np.random.default_rng(0)
    sd = {}
    for path, ref in flat.items():
        t_key = _torch_key(path)
        leaf = path[-1]
        if leaf == "kernel" and "patch_embed" in path[0]:
            shape = (ref.shape[-1], ref.shape[-2]) + ref.shape[:-2]  # conv
        elif leaf == "kernel":
            shape = ref.shape[::-1]  # linear
        else:
            shape = ref.shape
        sd[t_key] = rng.normal(size=shape).astype(np.float32)

    converted = _flatten(ti.convert_swinvit3d(sd))
    missing = set(flat) - set(converted)
    assert not missing, sorted(missing)[:5]
    for path, val in converted.items():
        assert val.shape == flat[path].shape, path


def test_ssl_fixup_prefixes():
    sd = {"module.swin_vit.layers1.0.blocks.0.mlp.linear1.weight": np.ones(2)}
    out = ti.ssl_swinvit_fixup(sd)
    assert "layers1.0.blocks.0.mlp.fc1.weight" in out
