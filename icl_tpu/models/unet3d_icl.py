"""ICL-instrumented 3D U-Net (reference `code/networks/unet_3D_icl.py:26-154`).

Shares the generic InherentConsistent implementation (spatial_dims=3
replaces the reference's SeparableConv3d/cbrt-reshape copy,
unet_3D_icl.py:155-315). ICL taps [center(dropout), up4, up3]:
in_chans (256, 128, 64), heads (16, 8, 4), resolutions
(P/16, P/8, P/4) = (6, 12, 24) for the 96³ BraTS/AMOS patches
(unet_3D_icl.py:77-97).
"""
from __future__ import annotations

from flax import linen as nn

from icl_tpu.models.icl import InherentConsistent, sspa_paired
from icl_tpu.models.unet3d import DEFAULT_FILTERS_3D, UNet3D


class UNet3DICL(nn.Module):
    in_chns: int
    class_num: int
    patch_size: int = 96
    # Fuse the two sspa passes into one batched call (weights read once;
    # docs/ROOFLINE.md §4.2). The ICL head tensors are small (≤24³), so
    # unlike the backbone (see __call__) this does NOT stress HBM.
    fuse_sspa_pair: bool = False

    def setup(self):
        ft = DEFAULT_FILTERS_3D
        self.backbone = UNet3D(self.in_chns, self.class_num, return_feats=True)
        icl_kwargs = dict(
            in_chans=(ft[4], ft[3], ft[2]),
            num_classes=self.class_num,
            num_heads=(16, 8, 4),
            input_resolution=(
                self.patch_size // 16,
                self.patch_size // 8,
                self.patch_size // 4,
            ),
            spatial_dims=3,
        )
        self.sspa = InherentConsistent(**icl_kwargs)
        self.uscl = InherentConsistent(**icl_kwargs)

    def __call__(self, x_lab, x_unlab=None, *, train: bool = False,
                 inference: bool = False):
        if inference or x_unlab is None:
            final_lab, _ = self.backbone(x_lab, train=train)
            return final_lab

        # Two sequential shared-weight passes, like the reference
        # (unet_3D_icl.py:99-148). A single concatenated pass would be
        # numerically identical (InstanceNorm is per-sample; no
        # BatchNorm coupling) but doubles the full-resolution decoder
        # temps: at the fp32 16-class AMOS config the fused step needs
        # 19.1G of the 15.75G HBM (up_concat1 activations at bs4).
        final_lab, feats_lab = self.backbone(x_lab, train=train)
        final_unlab, feats_unlab = self.backbone(x_unlab, train=train)

        if self.fuse_sspa_pair:
            feat_maps_lab, feat_maps_consis, updated_Qs_lab = sspa_paired(
                self.sspa, feats_lab, feats_unlab, train=train
            )
        else:
            feat_maps_lab, updated_Qs_lab = self.sspa(feats_lab, modal="labeled", train=train)
            feat_maps_consis, _ = self.sspa(feats_unlab, modal="labeled", train=train)
        feat_maps_unlab, _ = self.uscl(
            feats_unlab, updated_Qs_lab, modal="unlabeled", train=train
        )
        return final_lab, final_unlab, feat_maps_lab, feat_maps_unlab, feat_maps_consis
