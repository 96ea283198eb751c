"""Minimal einops test-shim — see tests/refshim/README.md.

Implements the `rearrange` subset the reference Swin files use
(swinunet_icl.py:382,410; swinunetr*.py:835-964): pure axis
permutations like "b c d h w -> b d h w c" and grouped reshapes like
"b h w (p1 p2 c) -> b (h p1) (w p2) c" with keyword axis sizes.
General algorithm (parse → reshape to atomic axes → transpose →
reshape to output groups), so any pattern without ellipsis/repeat
works. Torch tensors only; test-only, never imported by icl_tpu.
"""
from __future__ import annotations

import re


def _parse_side(side: str):
    """'b (h p1) c' -> [['b'], ['h', 'p1'], ['c']]"""
    groups = []
    for tok in re.findall(r"\([^)]*\)|\S+", side.strip()):
        if tok.startswith("("):
            groups.append(tok[1:-1].split())
        else:
            groups.append([tok])
    return groups


def rearrange(tensor, pattern: str, **axes_lengths):
    lhs_s, rhs_s = pattern.split("->")
    lhs, rhs = _parse_side(lhs_s), _parse_side(rhs_s)
    if len(lhs) != tensor.dim():
        raise ValueError(
            f"pattern {pattern!r} has {len(lhs)} groups for a "
            f"{tensor.dim()}-dim tensor"
        )

    # resolve atomic axis sizes from the input shape + kwargs
    sizes = dict(axes_lengths)
    for group, dim in zip(lhs, tensor.shape):
        known = [a for a in group if a in sizes]
        unknown = [a for a in group if a not in sizes]
        prod = 1
        for a in known:
            prod *= sizes[a]
        if len(unknown) > 1:
            raise ValueError(f"cannot infer sizes for {unknown} in {pattern!r}")
        if unknown:
            if dim % prod:
                raise ValueError(f"dim {dim} not divisible by {prod} in {pattern!r}")
            sizes[unknown[0]] = dim // prod
        elif prod != dim:
            raise ValueError(f"group {group} product {prod} != dim {dim}")

    flat_in = [a for g in lhs for a in g]
    flat_out = [a for g in rhs for a in g]
    if sorted(flat_in) != sorted(flat_out):
        raise ValueError(f"axes mismatch in {pattern!r}")

    x = tensor.reshape([sizes[a] for a in flat_in])
    x = x.permute([flat_in.index(a) for a in flat_out])
    out_shape = []
    for g in rhs:
        n = 1
        for a in g:
            n *= sizes[a]
        out_shape.append(n)
    return x.reshape(out_shape)
