"""2D U-Net family, channel-last (NHWC), Flax.

TPU-native rebuild of the reference 2D U-Net (`code/networks/unet.py`):
5-level encoder with feature channels [16, 32, 64, 128, 256], ConvBlocks
of (Conv3×3 → BN → LeakyReLU → Dropout → Conv3×3 → BN → LeakyReLU),
max-pool downsampling, conv1x1 + bilinear(align_corners=True) upsampling
with skip concat ordered [skip, upsampled] (unet.py:83-86), and a 3×3
output head.

NOTE on upsampling (verified against the real reference module in
tests/test_reference_parity.py): the reference config sets
`bilinear: False` (unet.py:313) but Decoder never forwards it to UpBlock
(unet.py:130-137), so the constructor default bilinear=True wins — every
reachable 2D decoder (UNet, UNet_icl, CCT/URPC/DS) upsamples with
conv1x1 + nn.Upsample(align_corners=True), NOT ConvTranspose.

Also provides the ICL decoder variant that taps multi-scale features
[x_1, x_2, x_3] (unet_icl.py:186-190) for the ICL heads.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from icl_tpu.models.layers import (
    BatchNorm,
    TorchConv,
    max_pool,
    upsample_align_corners,
)

DEFAULT_FEATURES = (16, 32, 64, 128, 256)
DEFAULT_DROPOUT = (0.05, 0.1, 0.2, 0.3, 0.5)


class ConvBlock(nn.Module):
    """Two Conv3×3+BN+LeakyReLU layers with dropout after the first
    (unet.py:32-48)."""

    features: int
    dropout_p: float

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = TorchConv(self.features, (3, 3), padding=1, name="conv1")(x)
        x = BatchNorm(name="bn1")(x, train)
        x = nn.leaky_relu(x, negative_slope=0.01)
        if self.dropout_p > 0:
            x = nn.Dropout(self.dropout_p)(x, deterministic=not train)
        x = TorchConv(self.features, (3, 3), padding=1, name="conv2")(x)
        x = BatchNorm(name="bn2")(x, train)
        x = nn.leaky_relu(x, negative_slope=0.01)
        return x


class UpBlock(nn.Module):
    """conv1x1 + bilinear 2× upsample (align_corners=True) + concat
    [skip, up] + ConvBlock (unet.py:66-87, bilinear=True — the only
    reachable path, see module docstring)."""

    features_mid: int  # channels after conv1x1 (= skip channels)
    features_out: int
    dropout_p: float = 0.0

    @nn.compact
    def __call__(self, x_deep, x_skip, *, train: bool):
        x_up = TorchConv(self.features_mid, (1, 1), name="conv1x1")(x_deep)
        x_up = upsample_align_corners(x_up, 2)
        x = jnp.concatenate([x_skip, x_up], axis=-1)
        return ConvBlock(self.features_out, self.dropout_p, name="conv")(x, train=train)


class Encoder(nn.Module):
    """5-level encoder (unet.py:90-117)."""

    in_chns: int
    features: Sequence[int] = DEFAULT_FEATURES
    dropout: Sequence[float] = DEFAULT_DROPOUT

    @nn.compact
    def __call__(self, x, *, train: bool):
        ft, dp = self.features, self.dropout
        x0 = ConvBlock(ft[0], dp[0], name="in_conv")(x, train=train)
        x1 = ConvBlock(ft[1], dp[1], name="down1")(max_pool(x0), train=train)
        x2 = ConvBlock(ft[2], dp[2], name="down2")(max_pool(x1), train=train)
        x3 = ConvBlock(ft[3], dp[3], name="down3")(max_pool(x2), train=train)
        x4 = ConvBlock(ft[4], dp[4], name="down4")(max_pool(x3), train=train)
        return [x0, x1, x2, x3, x4]


class Decoder(nn.Module):
    """Symmetric decoder with 3×3 output head (unet.py:120-154). When
    `return_feats`, also returns [x_1, x_2, x_3] multi-scale taps for the
    ICL heads (unet_icl.py:180-194)."""

    class_num: int
    features: Sequence[int] = DEFAULT_FEATURES
    return_feats: bool = False

    @nn.compact
    def __call__(self, feature, *, train: bool):
        x0, x1, x2, x3, x4 = feature
        ft = self.features
        x_1 = UpBlock(ft[3], ft[3], name="up1")(x4, x3, train=train)
        x_2 = UpBlock(ft[2], ft[2], name="up2")(x_1, x2, train=train)
        x_3 = UpBlock(ft[1], ft[1], name="up3")(x_2, x1, train=train)
        x = UpBlock(ft[0], ft[0], name="up4")(x_3, x0, train=train)
        output = TorchConv(self.class_num, (3, 3), padding=1, name="out_conv")(x)
        if self.return_feats:
            return output, [x_1, x_2, x_3]
        return output


class UNet(nn.Module):
    """Plain fully-supervised 2D U-Net (unet.py:305-322)."""

    in_chns: int
    class_num: int

    @nn.compact
    def __call__(self, x, *, train: bool = False, inference: bool = False):
        # `inference` accepted for a uniform predictor API with ICL models.
        feature = Encoder(self.in_chns, name="encoder")(x, train=train)
        return Decoder(self.class_num, name="decoder")(feature, train=train)
