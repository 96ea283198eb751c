"""ICL-instrumented Swin-UNet 2D (reference `vision_transformer.py:32-146`).

Grayscale inputs are repeated to 3 channels (:92-100). ICL heads consume
the decoder token taps directly (tokenized_input=True — the reference's
4th ICL copy skips the proj conv + norm, vision_transformer.py:245-247):
in_chans (384, 192, 96), resolutions (14, 28, 56), heads (24, 12, 6)
(:55-77).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from icl_tpu.models.icl import InherentConsistent, sspa_paired
from icl_tpu.models.swin2d import SwinConfig, SwinUNet2D


class SwinUNetICL(nn.Module):
    in_chns: int
    class_num: int
    img_size: int = 224
    window_size: int = 7
    # full geometry override (e.g. a `--cfg` yaml through
    # models.swin_config.get_swin_config); wins over img_size/window_size
    cfg: Optional[SwinConfig] = None
    # Fuse the two sspa passes into one batched call (weights read once;
    # docs/ROOFLINE.md §4.2).
    fuse_sspa_pair: bool = False

    def setup(self):
        cfg = self.cfg or SwinConfig(
            img_size=self.img_size, window_size=self.window_size)
        self.swin_unet = SwinUNet2D(self.class_num, cfg, return_feats=True)
        pr = cfg.img_size // cfg.patch_size  # 56
        icl_kwargs = dict(
            in_chans=(4 * cfg.embed_dim, 2 * cfg.embed_dim, cfg.embed_dim),
            num_classes=self.class_num,
            num_heads=(24, 12, 6),
            input_resolution=(pr // 4, pr // 2, pr),
            spatial_dims=2,
            tokenized_input=True,
        )
        self.sspa = InherentConsistent(**icl_kwargs)
        self.uscl = InherentConsistent(**icl_kwargs)

    def _expand(self, x):
        return jnp.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x

    def __call__(self, x_lab, x_unlab=None, *, train: bool = False,
                 inference: bool = False):
        x_lab = self._expand(x_lab)
        if inference:
            return self.swin_unet(x_lab, train=train)[0]
        x_unlab = self._expand(x_unlab)

        output_lab, feats_lab = self.swin_unet(x_lab, train=train)
        output_unlab, feats_unlab = self.swin_unet(x_unlab, train=train)

        if self.fuse_sspa_pair:
            feat_maps_lab, feat_maps_consisunlab, updated_Qs_lab = sspa_paired(
                self.sspa, feats_lab, feats_unlab, train=train
            )
        else:
            feat_maps_lab, updated_Qs_lab = self.sspa(feats_lab, modal="labeled", train=train)
            feat_maps_consisunlab, _ = self.sspa(feats_unlab, modal="labeled", train=train)
        feat_maps_unlab, _ = self.uscl(
            feats_unlab, updated_Qs_lab, modal="unlabeled", train=train
        )
        return (
            output_lab,
            output_unlab,
            feat_maps_lab,
            feat_maps_unlab,
            feat_maps_consisunlab,
        )
