"""Remaining model-zoo coverage: SSL UNet variants, SwinUNETR ICL, yaml
swin config."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icl_tpu.models.registry import net_factory


def _init(m, *xs, train=True):
    return m.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, *xs, train=train)


def test_unet_cct_outputs():
    m = net_factory("unet_cct", 1, 4)
    x = jnp.zeros((2, 16, 16, 1))
    v = _init(m, x)
    outs, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert len(outs) == 4 and all(o.shape == (2, 16, 16, 4) for o in outs)
    single = m.apply(v, x, train=False)
    assert single.shape == (2, 16, 16, 4)


@pytest.mark.parametrize("key", ["unet_urpc", "unet_ds"])
def test_unet_deep_supervision_variants(key):
    m = net_factory(key, 1, 4)
    x = jnp.zeros((2, 16, 16, 1))
    v = _init(m, x)
    outs, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert len(outs) == 4
    for o in outs:
        assert o.shape == (2, 16, 16, 4)


@pytest.mark.slow
def test_swinunetr_icl_contract():
    m = net_factory("swinunetr_icl", 1, 2, patch_size=32, feature_size=12,
                    window_size=(4, 4, 4))
    x = jnp.zeros((1, 32, 32, 32, 1))
    v = _init(m, x, x)
    outs, _ = m.apply(v, x, x, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(2)})
    out_lab, out_unlab, fm_lab, fm_unlab, fm_consis = outs
    assert out_lab.shape == (1, 32, 32, 32, 2)
    # taps P/16, P/8, P/4 = 2, 4, 8
    assert [f.shape for f in fm_lab] == [
        (1, 2, 2, 2, 2), (1, 4, 4, 4, 2), (1, 8, 8, 8, 2)
    ]
    inf = m.apply(v, x, train=False, inference=True)
    assert inf.shape == (1, 32, 32, 32, 2)


def test_swin_yaml_config(tmp_path):
    from icl_tpu.models.swin_config import get_swin_config

    y = tmp_path / "swin.yaml"
    y.write_text(
        "DATA:\n  IMG_SIZE: 224\nMODEL:\n  DROP_PATH_RATE: 0.2\n"
        "  SWIN:\n    EMBED_DIM: 96\n    DEPTHS: [2, 2, 2, 2]\n"
        "    NUM_HEADS: [3, 6, 12, 24]\n    WINDOW_SIZE: 7\n"
    )
    cfg = get_swin_config(str(y))
    assert cfg.embed_dim == 96 and cfg.window_size == 7
    assert cfg.depths == (2, 2, 2, 2) and cfg.drop_path_rate == 0.2
    cfg2 = get_swin_config(str(y), img_size=32, window_size=4)
    assert cfg2.img_size == 32 and cfg2.window_size == 4
