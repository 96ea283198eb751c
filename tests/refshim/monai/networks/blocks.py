"""monai.networks.blocks shim: MLPBlock, PatchEmbed, UnetOutBlock,
UnetrBasicBlock, UnetrUpBlock — the five blocks the reference SwinUNETR
files import (swinunetr.py:21-22, swinunetr_icl.py:23-24). Transcribed
from MONAI 1.0.1 (Apache-2.0): monai/networks/blocks/{mlp.py,
patchembedding.py, dynunet_block.py, unetr_block.py}. Faithfulness
notes (the details parity must not get wrong):

  * dynunet convs come from get_conv_layer(conv_only=True) → a MONAI
    `Convolution` (nn.Sequential with a single "conv" child, so
    state-dict keys are e.g. `conv1.conv.weight`), bias=False.
  * norm "instance" → torch InstanceNorm{2,3}d(num_features) with
    DEFAULT affine=False (MONAI's Norm factory adds no kwargs).
  * act = LeakyReLU(negative_slope=0.01) in Unet blocks; the residual
    path gets conv3/norm3 only when in!=out or stride!=1.
  * UnetOutBlock's conv is get_conv_layer(act=None, norm=None,
    conv_only=False, bias=True) → Convolution("conv" + empty "adn").
  * PatchEmbed pads each trailing dim up to a multiple of patch_size
    before the strided proj conv; optional norm runs on flattened
    tokens then reshapes back.
  * MLPBlock(dropout_mode="swin") shares ONE dropout module for both
    applications (drop2 is drop1).
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from monai.utils import ensure_tuple_rep


def _get_act(act):
    if act is None:
        return None
    if isinstance(act, str):
        name, args = act, {}
    elif isinstance(act, tuple):
        name, args = act
    else:  # a class like nn.GELU
        return act()
    name = name.lower()
    table = {"gelu": nn.GELU, "relu": nn.ReLU, "leakyrelu": nn.LeakyReLU,
             "prelu": nn.PReLU}
    return table[name](**args)


def _get_norm(norm_name, spatial_dims, channels):
    if isinstance(norm_name, tuple):
        name, args = norm_name
    else:
        name, args = norm_name, {}
    name = str(name).lower()
    if name == "instance":
        cls = (nn.InstanceNorm1d, nn.InstanceNorm2d, nn.InstanceNorm3d)[spatial_dims - 1]
        return cls(num_features=channels, **args)
    if name == "batch":
        cls = (nn.BatchNorm1d, nn.BatchNorm2d, nn.BatchNorm3d)[spatial_dims - 1]
        return cls(num_features=channels, **args)
    raise ValueError(norm_name)


def _get_padding(kernel_size, stride, dims):
    k = np.atleast_1d(kernel_size) * np.ones(dims, int)
    s = np.atleast_1d(stride) * np.ones(dims, int)
    pad = (k - s + 1) // 2
    if np.min(k - s + 1) < 0:
        raise AssertionError("padding value should not be negative")
    return tuple(int(p) for p in pad)


def get_conv_layer(spatial_dims, in_channels, out_channels, kernel_size=3,
                   stride=1, bias=False, conv_only=True, is_transposed=False):
    """dynunet_block.get_conv_layer, conv-only subset (all dynunet/unetr
    call sites in the reference use conv_only=True except UnetOutBlock,
    whose ADN is empty anyway). Wraps the conv in a Sequential with a
    "conv" child to reproduce MONAI Convolution's state-dict keys."""
    padding = _get_padding(kernel_size, stride, spatial_dims)
    if is_transposed:
        out_pad = tuple(
            2 * p + s - k
            for p, s, k in zip(
                padding,
                np.atleast_1d(stride) * np.ones(spatial_dims, int),
                np.atleast_1d(kernel_size) * np.ones(spatial_dims, int),
            )
        )
        cls = (nn.ConvTranspose1d, nn.ConvTranspose2d, nn.ConvTranspose3d)[spatial_dims - 1]
        conv = cls(in_channels, out_channels, kernel_size, stride=stride,
                   padding=padding, output_padding=out_pad, bias=bias)
    else:
        cls = (nn.Conv1d, nn.Conv2d, nn.Conv3d)[spatial_dims - 1]
        conv = cls(in_channels, out_channels, kernel_size, stride=stride,
                   padding=padding, bias=bias)
    seq = nn.Sequential()
    seq.add_module("conv", conv)
    return seq


class UnetResBlock(nn.Module):
    """dynunet_block.UnetResBlock (MONAI 1.0.1)."""

    def __init__(self, spatial_dims, in_channels, out_channels, kernel_size,
                 stride, norm_name):
        super().__init__()
        self.conv1 = get_conv_layer(spatial_dims, in_channels, out_channels,
                                    kernel_size=kernel_size, stride=stride)
        self.conv2 = get_conv_layer(spatial_dims, out_channels, out_channels,
                                    kernel_size=kernel_size, stride=1)
        self.lrelu = nn.LeakyReLU(inplace=True, negative_slope=0.01)
        self.norm1 = _get_norm(norm_name, spatial_dims, out_channels)
        self.norm2 = _get_norm(norm_name, spatial_dims, out_channels)
        self.downsample = in_channels != out_channels
        if not np.all(np.atleast_1d(stride) == 1):
            self.downsample = True
        if self.downsample:
            self.conv3 = get_conv_layer(spatial_dims, in_channels, out_channels,
                                        kernel_size=1, stride=stride)
            self.norm3 = _get_norm(norm_name, spatial_dims, out_channels)

    def forward(self, inp):
        residual = inp
        out = self.conv1(inp)
        out = self.norm1(out)
        out = self.lrelu(out)
        out = self.conv2(out)
        out = self.norm2(out)
        if hasattr(self, "conv3"):
            residual = self.conv3(residual)
        if hasattr(self, "norm3"):
            residual = self.norm3(residual)
        out += residual
        out = self.lrelu(out)
        return out


class UnetBasicBlock(nn.Module):
    """dynunet_block.UnetBasicBlock (two conv-norm-lrelu, no residual)."""

    def __init__(self, spatial_dims, in_channels, out_channels, kernel_size,
                 stride, norm_name):
        super().__init__()
        self.conv1 = get_conv_layer(spatial_dims, in_channels, out_channels,
                                    kernel_size=kernel_size, stride=stride)
        self.conv2 = get_conv_layer(spatial_dims, out_channels, out_channels,
                                    kernel_size=kernel_size, stride=1)
        self.lrelu = nn.LeakyReLU(inplace=True, negative_slope=0.01)
        self.norm1 = _get_norm(norm_name, spatial_dims, out_channels)
        self.norm2 = _get_norm(norm_name, spatial_dims, out_channels)

    def forward(self, inp):
        out = self.conv1(inp)
        out = self.norm1(out)
        out = self.lrelu(out)
        out = self.conv2(out)
        out = self.norm2(out)
        out = self.lrelu(out)
        return out


class UnetrBasicBlock(nn.Module):
    """unetr_block.UnetrBasicBlock."""

    def __init__(self, spatial_dims, in_channels, out_channels, kernel_size,
                 stride, norm_name, res_block=False):
        super().__init__()
        cls = UnetResBlock if res_block else UnetBasicBlock
        self.layer = cls(spatial_dims=spatial_dims, in_channels=in_channels,
                         out_channels=out_channels, kernel_size=kernel_size,
                         stride=stride, norm_name=norm_name)

    def forward(self, inp):
        return self.layer(inp)


class UnetrUpBlock(nn.Module):
    """unetr_block.UnetrUpBlock: transp-conv 2× up, concat skip, conv."""

    def __init__(self, spatial_dims, in_channels, out_channels, kernel_size,
                 upsample_kernel_size, norm_name, res_block=False):
        super().__init__()
        upsample_stride = upsample_kernel_size
        self.transp_conv = get_conv_layer(
            spatial_dims, in_channels, out_channels,
            kernel_size=upsample_kernel_size, stride=upsample_stride,
            conv_only=True, is_transposed=True,
        )
        cls = UnetResBlock if res_block else UnetBasicBlock
        self.conv_block = cls(
            spatial_dims=spatial_dims, in_channels=out_channels + out_channels,
            out_channels=out_channels, kernel_size=kernel_size, stride=1,
            norm_name=norm_name,
        )

    def forward(self, inp, skip):
        out = self.transp_conv(inp)
        out = torch.cat((out, skip), dim=1)
        out = self.conv_block(out)
        return out


class UnetOutBlock(nn.Module):
    """dynunet_block.UnetOutBlock: 1×1 conv with bias."""

    def __init__(self, spatial_dims, in_channels, out_channels, dropout=None):
        super().__init__()
        self.conv = get_conv_layer(spatial_dims, in_channels, out_channels,
                                   kernel_size=1, stride=1, bias=True,
                                   conv_only=True)

    def forward(self, inp):
        return self.conv(inp)


class MLPBlock(nn.Module):
    """blocks/mlp.py MLPBlock. dropout_mode="swin" shares one dropout
    module (drop2 IS drop1); "vit" uses two independent ones."""

    def __init__(self, hidden_size, mlp_dim, dropout_rate=0.0, act="GELU",
                 dropout_mode="vit"):
        super().__init__()
        mlp_dim = mlp_dim or hidden_size
        self.linear1 = nn.Linear(hidden_size, mlp_dim)
        self.linear2 = nn.Linear(mlp_dim, hidden_size)
        self.fn = _get_act(act)
        self.drop1 = nn.Dropout(dropout_rate)
        if dropout_mode == "vit":
            self.drop2 = nn.Dropout(dropout_rate)
        elif dropout_mode == "swin":
            self.drop2 = self.drop1
        else:
            raise ValueError(dropout_mode)

    def forward(self, x):
        x = self.fn(self.linear1(x))
        x = self.drop1(x)
        x = self.linear2(x)
        x = self.drop2(x)
        return x


class PatchEmbed(nn.Module):
    """blocks/patchembedding.py PatchEmbed (MONAI 1.0.1): pad trailing
    dims to patch multiples, strided conv proj, optional token norm."""

    def __init__(self, patch_size=2, in_chans=1, embed_dim=48,
                 norm_layer=None, spatial_dims=3):
        super().__init__()
        patch_size = ensure_tuple_rep(patch_size, spatial_dims)
        self.patch_size = patch_size
        self.embed_dim = embed_dim
        cls = (nn.Conv1d, nn.Conv2d, nn.Conv3d)[spatial_dims - 1]
        self.proj = cls(in_chans, embed_dim, kernel_size=patch_size,
                        stride=patch_size)
        self.norm = norm_layer(embed_dim) if norm_layer is not None else None

    def forward(self, x):
        x_shape = x.size()
        if len(x_shape) == 5:
            _, _, d, h, w = x_shape
            if w % self.patch_size[2] != 0:
                x = F.pad(x, (0, self.patch_size[2] - w % self.patch_size[2]))
            if h % self.patch_size[1] != 0:
                x = F.pad(x, (0, 0, 0, self.patch_size[1] - h % self.patch_size[1]))
            if d % self.patch_size[0] != 0:
                x = F.pad(x, (0, 0, 0, 0, 0, self.patch_size[0] - d % self.patch_size[0]))
        elif len(x_shape) == 4:
            _, _, h, w = x_shape
            if w % self.patch_size[1] != 0:
                x = F.pad(x, (0, self.patch_size[1] - w % self.patch_size[1]))
            if h % self.patch_size[0] != 0:
                x = F.pad(x, (0, 0, 0, self.patch_size[0] - h % self.patch_size[0]))
        x = self.proj(x)
        if self.norm is not None:
            x_shape = x.size()
            x = x.flatten(2).transpose(1, 2)
            x = self.norm(x)
            if len(x_shape) == 5:
                d, wh, ww = x_shape[2], x_shape[3], x_shape[4]
                x = x.transpose(1, 2).view(-1, self.embed_dim, d, wh, ww)
            elif len(x_shape) == 4:
                wh, ww = x_shape[2], x_shape[3]
                x = x.transpose(1, 2).view(-1, self.embed_dim, wh, ww)
        return x
