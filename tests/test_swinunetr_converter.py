"""Full-model SwinUNETR flax↔torch interop (VERDICT r1 item 5): export
produces the reference/MONAI key layout, the importer inverts it
exactly, and coverage is total — every flax param leaf round-trips."""
import pytest

# slow tier: excluded from the quick gate (pytest.ini)
pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from icl_tpu.models.registry import net_factory
from icl_tpu.utils import torch_import as ti


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def test_swinunetr_export_import_roundtrip():
    m = net_factory("swinunetr", 1, 2, feature_size=12, window_size=(4, 4, 4))
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               jnp.zeros((1, 32, 32, 32, 1)), train=False)
    params = jax.device_get(v["params"])

    sd = ti.export_swinunetr(params)
    # reference/MONAI key layout spot checks
    assert "swinViT.patch_embed.proj.weight" in sd
    assert "swinViT.layers1.0.blocks.1.mlp.linear1.weight" in sd
    assert "encoder10.layer.conv1.conv.weight" in sd
    assert "decoder5.transp_conv.conv.weight" in sd
    assert "decoder5.conv_block.conv3.conv.weight" in sd
    assert "out.conv.conv.weight" in sd and "out.conv.conv.bias" in sd
    # bias-free blocks stay bias-free (MONAI get_conv_layer bias=False)
    assert "decoder5.transp_conv.conv.bias" not in sd
    assert "encoder1.layer.conv1.conv.bias" not in sd
    # torch layouts: conv OIDHW, linear (out, in)
    k = params["encoder10"]["conv1"]["Conv_0"]["kernel"]
    assert sd["encoder10.layer.conv1.conv.weight"].shape == (
        k.shape[4], k.shape[3], k.shape[0], k.shape[1], k.shape[2])

    back, bs, missing = ti.convert_swinunetr_ckpt(sd)
    assert not missing and not bs

    flat_in, flat_out = _flatten(params), _flatten(back)
    assert set(flat_in) == set(flat_out), (
        sorted(set(flat_in) ^ set(flat_out))[:6])
    for path in flat_in:
        np.testing.assert_array_equal(flat_in[path], flat_out[path], err_msg=str(path))


def test_swinunetr_icl_stripped_ckpt_imports_into_backbone():
    """A swinunetr_icl best checkpoint is the plain SwinUNETR state dict
    (heads stripped at save); the importer must fill the ICL model's
    `backbone` subtree completely."""
    m = net_factory("swinunetr_icl", 1, 2, patch_size=32, feature_size=12,
                    window_size=(4, 4, 4))
    x = jnp.zeros((1, 32, 32, 32, 1))
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               x, x, train=False)
    params = jax.device_get(v["params"])

    sd = ti.export_swinunetr(params["backbone"])
    back, _, missing = ti.convert_swinunetr_ckpt(sd)
    assert not missing
    assert set(_flatten(back)) == set(_flatten(params["backbone"]))
