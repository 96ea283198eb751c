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
def _icl_unet(in_chns, class_num, patch_size: int = 256,
              fuse_sspa_pair: bool = False, **kw):
    from icl_tpu.models.unet2d_icl import UNetICL

    return UNetICL(in_chns=in_chns, class_num=class_num, patch_size=patch_size,
                   fuse_sspa_pair=fuse_sspa_pair)


@register("unet_cct")
def _unet_cct(in_chns, class_num, **kw):
    from icl_tpu.models.unet2d_variants import UNetCCT

    return UNetCCT(in_chns=in_chns, class_num=class_num)


@register("unet_urpc")
def _unet_urpc(in_chns, class_num, **kw):
    from icl_tpu.models.unet2d_variants import UNetURPC

    return UNetURPC(in_chns=in_chns, class_num=class_num)


@register("unet_ds")
def _unet_ds(in_chns, class_num, **kw):
    from icl_tpu.models.unet2d_variants import UNetDS

    return UNetDS(in_chns=in_chns, class_num=class_num)


@register("swinunet")
def _swinunet(in_chns, class_num, img_size: int = 224, window_size: int = 7,
              swin_cfg=None, **kw):
    from icl_tpu.models.swin2d import SwinUnetWrapper

    # swin_cfg: full SwinConfig (e.g. --cfg yaml) overriding the geometry
    return SwinUnetWrapper(in_chns=in_chns, class_num=class_num,
                           img_size=img_size, window_size=window_size,
                           cfg=swin_cfg)


@register("icl_swinunet")
def _icl_swinunet(in_chns, class_num, img_size: int = 224, patch_size: int = 224,
                  window_size: int = 7, swin_cfg=None,
                  fuse_sspa_pair: bool = False, **kw):
    from icl_tpu.models.swin2d_icl import SwinUNetICL

    # patch_size alias: trainers pass the training patch (= img size here)
    return SwinUNetICL(in_chns=in_chns, class_num=class_num,
                       img_size=img_size if img_size != 224 else patch_size,
                       window_size=window_size, cfg=swin_cfg,
                       fuse_sspa_pair=fuse_sspa_pair)


@register("unet_3D")
def _unet_3d(in_chns, class_num, **kw):
    from icl_tpu.models.unet3d import UNet3D

    return UNet3D(in_chns=in_chns, class_num=class_num)


@register("unet_3D_icl")
def _unet_3d_icl(in_chns, class_num, patch_size: int = 96,
                 fuse_sspa_pair: bool = False, **kw):
    from icl_tpu.models.unet3d_icl import UNet3DICL

    return UNet3DICL(in_chns=in_chns, class_num=class_num, patch_size=patch_size,
                     fuse_sspa_pair=fuse_sspa_pair)


@register("swinunetr")
def _swinunetr(in_chns, class_num, feature_size: int = 48,
               window_size=(7, 7, 7), remat: bool = False, **kw):
    from icl_tpu.models.swinunetr import SwinUNETR

    return SwinUNETR(in_chns=in_chns, class_num=class_num,
                     feature_size=feature_size, window_size=tuple(window_size),
                     remat=remat)


@register("swinunetr_icl")
def _swinunetr_icl(in_chns, class_num, patch_size: int = 96,
                   feature_size: int = 48, window_size=(7, 7, 7),
                   remat: bool = False, fuse_sspa_pair: bool = False, **kw):
    from icl_tpu.models.swinunetr_icl import SwinUNETRICL

    return SwinUNETRICL(in_chns=in_chns, class_num=class_num,
                        img_size=patch_size, feature_size=feature_size,
                        window_size=tuple(window_size), remat=remat,
                        fuse_sspa_pair=fuse_sspa_pair)
