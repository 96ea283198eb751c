"""monai.networks.layers shim: Conv factory, DropPath, trunc_normal_.

Conv is MONAI's LayerFactory keyed as Conv[Conv.CONV, spatial_dims]
(monai/networks/layers/factories.py). DropPath/trunc_normal_ are the
timm implementations MONAI vendors (monai/networks/layers/weight_init.py,
monai/networks/blocks/... — identical math)."""
from __future__ import annotations

import math

import torch
import torch.nn as nn


class _ConvFactory:
    CONV = "conv"
    CONVTRANS = "convtrans"

    _TYPES = {
        "conv": (nn.Conv1d, nn.Conv2d, nn.Conv3d),
        "convtrans": (nn.ConvTranspose1d, nn.ConvTranspose2d, nn.ConvTranspose3d),
    }

    def __getitem__(self, key):
        name, dim = key
        return self._TYPES[str(name).lower()][dim - 1]


Conv = _ConvFactory()


class DropPath(nn.Module):
    """Stochastic depth per sample (timm rw impl, vendored by MONAI)."""

    def __init__(self, drop_prob: float = 0.0, scale_by_keep: bool = True):
        super().__init__()
        self.drop_prob = float(drop_prob)
        self.scale_by_keep = scale_by_keep

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = x.new_empty(shape).bernoulli_(keep)
        if keep > 0.0 and self.scale_by_keep:
            mask.div_(keep)
        return x * mask


def trunc_normal_(tensor, mean: float = 0.0, std: float = 1.0,
                  a: float = -2.0, b: float = 2.0):
    """timm's inverse-CDF truncated normal init."""

    def norm_cdf(x):
        return (1.0 + math.erf(x / math.sqrt(2.0))) / 2.0

    with torch.no_grad():
        lo = norm_cdf((a - mean) / std)
        hi = norm_cdf((b - mean) / std)
        tensor.uniform_(2 * lo - 1, 2 * hi - 1)
        tensor.erfinv_()
        tensor.mul_(std * math.sqrt(2.0))
        tensor.add_(mean)
        tensor.clamp_(min=a, max=b)
        return tensor
