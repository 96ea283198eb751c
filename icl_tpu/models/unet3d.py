"""3D U-Net family, channel-last (NDHWC), Flax.

TPU-native rebuild of the reference 3D U-Net (`code/networks/unet_3D.py:
21-100` with blocks from `networks/utils.py:99-124,260-278`): filters
[16, 32, 64, 128, 256] (feature_scale 4), double Conv3×3×3 +
InstanceNorm + ReLU blocks, max-pool downsampling, trilinear-upsample +
concat [skip, up] decoder, dropout 0.3 at the center and last up stage,
1×1×1 output head. Conv weights use kaiming-normal init
(networks_other.py:64-76 'kaiming').
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from icl_tpu.models.layers import make_torch_bias_init, max_pool


def kaiming_normal_kernel_init(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_(a=0, mode='fan_in'): N(0, sqrt(2/fan_in))."""
    fan_in = math.prod(shape[:-1])
    return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / fan_in)


class InstanceNorm(nn.Module):
    """torch InstanceNorm (affine=False, no running stats, eps 1e-5):
    per-sample per-channel normalization over spatial dims — identical in
    train and eval, no state. GroupNorm(groups=C) without affine."""

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=x.shape[-1], epsilon=1e-5, use_bias=False, use_scale=False
        )(x)


class ConvBlock3D(nn.Module):
    """UnetConv3: (Conv3^3 → InstanceNorm → ReLU) ×2 (networks/utils.py:99-124)."""

    features: int

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            cin = x.shape[-1]
            x = nn.Conv(
                self.features, (3, 3, 3), padding=1,
                kernel_init=kaiming_normal_kernel_init,
                bias_init=make_torch_bias_init(cin * 27),
                name=f"conv{i + 1}",
            )(x)
            x = InstanceNorm(name=f"in{i + 1}")(x)
            x = nn.relu(x)
        return x


class UpBlock3D(nn.Module):
    """UnetUp3_CT: trilinear 2× upsample + concat [skip, up] + ConvBlock3D
    (networks/utils.py:260-278)."""

    features: int

    @nn.compact
    def __call__(self, x_skip, x_deep):
        B, D, H, W, C = x_deep.shape
        up = jax.image.resize(
            x_deep, (B, 2 * D, 2 * H, 2 * W, C), method="linear"
        )
        x = jnp.concatenate([x_skip, up], axis=-1)
        return ConvBlock3D(self.features, name="conv")(x)


DEFAULT_FILTERS_3D = (16, 32, 64, 128, 256)  # [64..1024]/feature_scale 4


class UNet3D(nn.Module):
    """Plain 3D U-Net (unet_3D.py:21-100). `return_feats` additionally
    yields the ICL taps [center(dropout), up4, up3] (unet_3D_icl.py:141)."""

    in_chns: int
    class_num: int
    filters: Sequence[int] = DEFAULT_FILTERS_3D
    return_feats: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False, inference: bool = False):
        ft = self.filters
        conv1 = ConvBlock3D(ft[0], name="conv1")(x)
        conv2 = ConvBlock3D(ft[1], name="conv2")(max_pool(conv1))
        conv3 = ConvBlock3D(ft[2], name="conv3")(max_pool(conv2))
        conv4 = ConvBlock3D(ft[3], name="conv4")(max_pool(conv3))
        center = ConvBlock3D(ft[4], name="center")(max_pool(conv4))
        center = nn.Dropout(0.3, name="dropout1")(center, deterministic=not train)

        up4 = UpBlock3D(ft[3], name="up_concat4")(conv4, center)
        up3 = UpBlock3D(ft[2], name="up_concat3")(conv3, up4)
        up2 = UpBlock3D(ft[1], name="up_concat2")(conv2, up3)
        up1 = UpBlock3D(ft[0], name="up_concat1")(conv1, up2)
        up1 = nn.Dropout(0.3, name="dropout2")(up1, deterministic=not train)

        cin = up1.shape[-1]
        final = nn.Conv(
            self.class_num, (1, 1, 1),
            kernel_init=kaiming_normal_kernel_init,
            bias_init=make_torch_bias_init(cin),
            name="final",
        )(up1)
        if self.return_feats:
            return final, [center, up4, up3]
        return final
