"""timm.models.layers shim: DropPath, to_2tuple, trunc_normal_ — the
three symbols the reference Swin 2D files import (swinunet_icl.py:9)."""
from collections import abc

from monai.networks.layers import DropPath, trunc_normal_  # noqa: F401  (shim sibling)


def to_2tuple(x):
    if isinstance(x, abc.Iterable) and not isinstance(x, str):
        return tuple(x)
    return (x, x)
