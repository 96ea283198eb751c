"""ICL-instrumented SwinUNETR 3D (reference `swinunetr_icl.py:30-357`).

Shared-weight two-branch forward; ICL heads on the decoder taps
[dec3, dec2, dec1] (a 4th tap dec0 is passed but unused — depths[:3],
swinunetr_icl.py:232-245): in_chans (8fs, 4fs, 2fs) = (384, 192, 96),
resolutions (P/16, P/8, P/4) = (6, 12, 24) at 96³, heads
num_heads[::-1][:3] = (24, 12, 6).
"""
from __future__ import annotations

from typing import Sequence

from flax import linen as nn

from icl_tpu.models.icl import InherentConsistent, sspa_paired
from icl_tpu.models.swinunetr import SwinUNETR


class SwinUNETRICL(nn.Module):
    in_chns: int
    class_num: int
    img_size: int = 96
    feature_size: int = 48
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: Sequence[int] = (7, 7, 7)
    remat: bool = False
    # Fuse the two sspa passes into one batched call (weights read once;
    # docs/ROOFLINE.md §4.2). ICL-head tensors are ≤24³ — no HBM risk,
    # unlike fusing the backbone passes (see __call__).
    fuse_sspa_pair: bool = False

    def setup(self):
        fs = self.feature_size
        self.backbone = SwinUNETR(
            in_chns=self.in_chns, class_num=self.class_num, feature_size=fs,
            num_heads=self.num_heads, window_size=self.window_size,
            return_feats=True, remat=self.remat,
        )
        icl_kwargs = dict(
            in_chans=(8 * fs, 4 * fs, 2 * fs),
            num_classes=self.class_num,
            num_heads=tuple(reversed(self.num_heads))[:3],
            input_resolution=(
                self.img_size // 16, self.img_size // 8, self.img_size // 4
            ),
            spatial_dims=3,
        )
        self.sspa = InherentConsistent(**icl_kwargs)
        self.uscl = InherentConsistent(**icl_kwargs)

    def __call__(self, x_lab, x_unlab=None, *, train: bool = False,
                 inference: bool = False):
        if inference or x_unlab is None:
            logits_lab, _ = self.backbone(x_lab, train=train)
            return logits_lab
        # Two sequential shared-weight passes, like the reference
        # (swinunetr_icl.py:310-348). A single concatenated pass would be
        # numerically identical (no BatchNorm in this backbone) but OOMs
        # the 16G chip at the BraTS config: the full-res decoder1 conv
        # temps double with batch (measured 17.1G > 15.75G HBM; C=48
        # channel-last pads 2.7× to the 128-lane layout). UNet3DICL, with
        # 16-channel full-res activations, does use the concat form.
        logits_lab, feats_lab = self.backbone(x_lab, train=train)
        logits_unlab, feats_unlab = self.backbone(x_unlab, train=train)

        # Only the first 3 taps are consumed (depths[:3] in the reference)
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
        return logits_lab, logits_unlab, feat_maps_lab, feat_maps_unlab, feat_maps_consis
