"""Model factory (reference `code/networks/net_factory.py:78-89` and
`net_factory_3d.py:39-68`), without the reference's import-time argparse
coupling (a documented defect, SURVEY.md §7).

Returns an un-initialized Flax module; parameter init is the trainer's
job (models are pure in JAX — no `.cuda()` at construction).
"""
from __future__ import annotations

from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def net_factory(net_type: str, in_chns: int, class_num: int, **kwargs):
    """String → Flax module. 2D keys: unet, icl_unet, swinunet,
    icl_swinunet. 3D keys: unet_3D, unet_3D_icl, swinunetr, swinunetr_icl."""
    if net_type not in _REGISTRY:
        raise KeyError(
            f"unknown net_type {net_type!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[net_type](in_chns=in_chns, class_num=class_num, **kwargs)


@register("unet")
def _unet(in_chns, class_num, **kw):
    from icl_tpu.models.unet2d import UNet

    return UNet(in_chns=in_chns, class_num=class_num)


@register("icl_unet")
def _icl_unet(in_chns, class_num, patch_size: int = 256, **kw):
    from icl_tpu.models.unet2d_icl import UNetICL

    return UNetICL(in_chns=in_chns, class_num=class_num, patch_size=patch_size)


@register("unet_3D")
def _unet_3d(in_chns, class_num, **kw):
    from icl_tpu.models.unet3d import UNet3D

    return UNet3D(in_chns=in_chns, class_num=class_num)


@register("unet_3D_icl")
def _unet_3d_icl(in_chns, class_num, patch_size: int = 96, **kw):
    from icl_tpu.models.unet3d_icl import UNet3DICL

    return UNet3DICL(in_chns=in_chns, class_num=class_num, patch_size=patch_size)
