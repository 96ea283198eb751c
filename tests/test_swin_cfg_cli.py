"""--cfg yaml surface on the Swin CLIs (VERDICT r3 item 7): the yaml
routes through models.swin_config.get_swin_config into the model
factory, yaml geometry wins over the convenience flags, and IMG_SIZE
follows --patch_size (reference constructs the net with the CLI
img_size, train_fully_supervised_swinunet_2D_ACDC.py:95-96)."""
import argparse

import jax
import jax.numpy as jnp
import pytest

from icl_tpu.models.registry import net_factory
from icl_tpu.models.swin_config import get_swin_config, swin_cli_kwargs

LITE_YAML = "configs/swin_tiny_patch4_window7_224_lite.yaml"


def _repo(p):
    import os

    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), p)


def test_lite_yaml_loads_to_default_geometry():
    cfg = get_swin_config(_repo(LITE_YAML))
    assert cfg.embed_dim == 96
    assert cfg.depths == (2, 2, 2, 2)
    assert cfg.num_heads == (3, 6, 12, 24)
    assert cfg.window_size == 7
    assert cfg.drop_path_rate == 0.2
    assert cfg.qkv_bias and cfg.patch_norm and not cfg.ape


def test_yaml_overrides_geometry(tmp_path):
    y = tmp_path / "custom.yaml"
    y.write_text(
        "DATA:\n  IMG_SIZE: 448\n"
        "MODEL:\n  DROP_PATH_RATE: 0.1\n"
        "  SWIN:\n    EMBED_DIM: 48\n    WINDOW_SIZE: 14\n"
        "    DEPTHS: [2, 2, 6, 2]\n    NUM_HEADS: [2, 4, 8, 16]\n"
    )
    cfg = get_swin_config(str(y))
    assert (cfg.img_size, cfg.embed_dim, cfg.window_size) == (448, 48, 14)
    assert cfg.depths == (2, 2, 6, 2) and cfg.num_heads == (2, 4, 8, 16)
    # explicit overrides (the CLI's --patch_size) win over the yaml
    cfg = get_swin_config(str(y), img_size=224)
    assert cfg.img_size == 224


def test_swin_cli_kwargs_contract(tmp_path):
    args = argparse.Namespace(cfg=_repo(LITE_YAML), patch_size=[224, 224],
                              pretrained_ckpt=None)
    kw = swin_cli_kwargs(args)
    assert kw["swin_cfg"].img_size == 224
    # no --cfg -> no kwargs (default SwinConfig path unchanged)
    assert swin_cli_kwargs(argparse.Namespace(cfg=None)) == {}
    # PRETRAIN_CKPT picked up from the yaml when the file exists
    ckpt = tmp_path / "w.pth"
    ckpt.write_bytes(b"x")
    y = tmp_path / "c.yaml"
    y.write_text(f"MODEL:\n  PRETRAIN_CKPT: {ckpt}\n")
    args = argparse.Namespace(cfg=str(y), patch_size=[224, 224],
                              pretrained_ckpt=None)
    swin_cli_kwargs(args)
    assert args.pretrained_ckpt == str(ckpt)


@pytest.mark.slow
def test_factory_swin_cfg_changes_params():
    """A non-default EMBED_DIM through the factory actually changes the
    built network (proves the cfg reaches SwinUNet2D, not just the
    wrapper)."""
    # 224² keeps every stage resolution (56/28/14/7) a multiple of the
    # 7-window; the non-default width/depth prove the yaml geometry wins
    small = get_swin_config(None, img_size=224, embed_dim=24, window_size=7,
                            depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2))
    model = net_factory("swinunet", in_chns=1, class_num=4, img_size=224,
                        swin_cfg=small)
    x = jnp.zeros((1, 224, 224, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    emb = variables["params"]["swin_unet"]["patch_embed_proj"]["Conv_0"]["kernel"]
    assert emb.shape[-1] == 24  # embed_dim flowed through
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 224, 224, 4)
