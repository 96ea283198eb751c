"""Swin yaml config loader (reference `code/config.py:227-234` get_config
over `configs/swin_tiny_patch4_window7_224_lite.yaml`).

The reference freezes a yacs CfgNode; here the yaml (if provided) maps
onto the typed SwinConfig dataclass. Without a yaml, the defaults ARE
the swin-tiny-lite values, so `get_swin_config()` with no argument is
the common path.
"""
from __future__ import annotations

from typing import Optional

from icl_tpu.models.swin2d import SwinConfig


def get_swin_config(yaml_path: Optional[str] = None, **overrides) -> SwinConfig:
    kwargs = {}
    if yaml_path:
        import yaml

        with open(yaml_path) as f:
            spec = yaml.safe_load(f) or {}
        model = spec.get("MODEL", {})
        swin = model.get("SWIN", {})
        data = spec.get("DATA", {})
        mapping = {
            "img_size": data.get("IMG_SIZE"),
            "patch_size": swin.get("PATCH_SIZE"),
            "in_chans": swin.get("IN_CHANS"),
            "embed_dim": swin.get("EMBED_DIM"),
            "depths": tuple(swin["DEPTHS"]) if "DEPTHS" in swin else None,
            "num_heads": tuple(swin["NUM_HEADS"]) if "NUM_HEADS" in swin else None,
            "window_size": swin.get("WINDOW_SIZE"),
            "mlp_ratio": swin.get("MLP_RATIO"),
            "qkv_bias": swin.get("QKV_BIAS"),
            "drop_path_rate": model.get("DROP_PATH_RATE"),
            "ape": swin.get("APE"),
            "patch_norm": swin.get("PATCH_NORM"),
        }
        kwargs = {k: v for k, v in mapping.items() if v is not None}
    kwargs.update(overrides)
    return SwinConfig(**kwargs)


def swin_cli_kwargs(args) -> dict:
    """`--cfg` CLI surface shared by the Swin scripts: yaml →
    model_kwargs['swin_cfg'], with IMG_SIZE following --patch_size (the
    reference constructs the net with img_size from the CLI) and the
    yaml's MODEL.PRETRAIN_CKPT used when --pretrained_ckpt wasn't given
    (reference `model.load_from(config)` semantics,
    train_fully_supervised_swinunet_2D_ACDC.py:96)."""
    if not getattr(args, "cfg", None):
        return {}
    import os

    kwargs = {"swin_cfg": get_swin_config(args.cfg, img_size=args.patch_size[0])}
    if not getattr(args, "pretrained_ckpt", None):
        import yaml

        spec = yaml.safe_load(open(args.cfg)) or {}
        ckpt = spec.get("MODEL", {}).get("PRETRAIN_CKPT")
        if ckpt and os.path.exists(ckpt):
            args.pretrained_ckpt = ckpt
    return kwargs
