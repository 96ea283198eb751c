"""ICL-instrumented 2D U-Net (reference `code/networks/unet_icl.py:196-252`).

UNet encoder/decoder with multi-scale decoder taps feeding two
`InherentConsistent` heads: SSPA (labeled semantics) and USCL (unlabeled
semantic consistency). Training forward runs labeled and unlabeled
sub-batches through shared weights as two separate passes (separate BN
batch stats per branch — reference behavior, SURVEY.md §7).

ICL geometry for patch P (reference hard-codes P=256,
unet_icl.py:200-216): in_chans (128, 64, 32) = feature_chns[3..1],
resolutions (P/8, P/4, P/2), heads (8, 4, 2).
"""
from __future__ import annotations

from flax import linen as nn

from icl_tpu.models.icl import InherentConsistent, sspa_paired
from icl_tpu.models.unet2d import DEFAULT_FEATURES, Decoder, Encoder


class UNetICL(nn.Module):
    in_chns: int
    class_num: int
    patch_size: int = 256
    # Fuse the two sspa passes into one batched call (one weight read
    # for the HBM-bound class-decoder kernels — docs/ROOFLINE.md §4.2).
    # Per-branch BN stats / labeled-only Q-means preserved (icl.py).
    fuse_sspa_pair: bool = False
    # stochasticity knobs (reference defaults). zero_stochastic=True
    # turns off dropout + drop-path while keeping BN batch-stat updates
    # — used by the train-step reference-parity test, where dropout
    # randomness can't be matched bit-for-bit across frameworks.
    zero_stochastic: bool = False

    def setup(self):
        ft = DEFAULT_FEATURES
        enc_dropout = (0.0,) * 5 if self.zero_stochastic else Encoder.dropout
        self.encoder = Encoder(self.in_chns, dropout=enc_dropout)
        self.decoder = Decoder(self.class_num, return_feats=True)
        icl_kwargs = dict(
            in_chans=(ft[3], ft[2], ft[1]),
            num_classes=self.class_num,
            num_heads=(8, 4, 2),
            input_resolution=(
                self.patch_size // 8,
                self.patch_size // 4,
                self.patch_size // 2,
            ),
            spatial_dims=2,
            drop_path_rate=0.0 if self.zero_stochastic else 0.1,
        )
        self.sspa = InherentConsistent(**icl_kwargs)
        self.uscl = InherentConsistent(**icl_kwargs)

    def __call__(self, x_lab, x_unlab=None, *, train: bool = False,
                 inference: bool = False):
        feature_lab = self.encoder(x_lab, train=train)
        output_lab, feats_lab = self.decoder(feature_lab, train=train)
        if inference:
            return output_lab

        feature_unlab = self.encoder(x_unlab, train=train)
        output_unlab, feats_unlab = self.decoder(feature_unlab, train=train)

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
