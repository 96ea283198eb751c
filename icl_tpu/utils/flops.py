"""Analytic matmul/conv FLOPs from hand-derived formulas.

MFU cross-check (VERDICT r3 item 3): XLA's `cost_analysis()['flops']` is
a cost MODEL of the optimized HLO — it double-counts rematerialized
forwards and mis-prices mixed-precision passes, producing >100%-of-peak
rows. This module instead walks the *traced jaxpr* of a function and
applies the textbook formulas the reference itself uses in its
`flops()` methods (/root/reference/code/swinunet_icl.py:160-171):

  dot_general:           2 · prod(batch) · M · N · K
  conv_general_dilated:  2 · prod(out_shape) · prod(kernel)/O
                         (= 2 · out_elems · Cin/groups · prod(k_spatial))

Everything else (elementwise, reductions, gathers) is ignored — on TPU
the MXU matmul/conv FLOPs are the roofline numerator.

Two numerators fall out:
  * `analytic_fwd_flops(model_apply, *args)` on the FORWARD — the
    algorithmic cost; training step ≈ 3× (fwd + bwd-input + bwd-weight).
  * `analytic_step_flops(step_fn, *args)` on the full TRAIN STEP jaxpr —
    the executed cost including remat recompute (tracing goes through
    the vjp, so checkpointed recomputes appear as real equations).

The gap between the two is exactly the remat overhead; the gap between
either and XLA's cost model is the model's over-count.
"""
from __future__ import annotations

import math
from typing import Any

import jax


def _dot_general_flops(eqn) -> float:
    (lhs, rhs) = (v.aval for v in eqn.invars[:2])
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    k = math.prod(lhs.shape[d] for d in lc)
    b = math.prod(lhs.shape[d] for d in lb)
    m = math.prod(
        s for d, s in enumerate(lhs.shape) if d not in lc and d not in lb
    )
    n = math.prod(
        s for d, s in enumerate(rhs.shape) if d not in rc and d not in rb
    )
    return 2.0 * b * m * n * k


def _conv_flops(eqn) -> float:
    rhs = eqn.invars[1].aval
    out = eqn.outvars[0].aval
    # rhs layout from dimension_numbers: each output element accumulates
    # (Cin/groups)·prod(kernel_spatial) MACs = prod(rhs.shape)/O.
    dn = eqn.params["dimension_numbers"]
    o_dim = dn.rhs_spec[0]  # rhs_spec = (out_feature, in_feature, *spatial)
    batch_groups = eqn.params.get("batch_group_count", 1) or 1
    macs_per_out = math.prod(rhs.shape) / rhs.shape[o_dim] / batch_groups
    return 2.0 * math.prod(out.shape) * macs_per_out


def _count(jaxpr, mult: float, acc: dict) -> None:
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            acc["flops"] += mult * _dot_general_flops(eqn)
        elif prim == "conv_general_dilated":
            acc["flops"] += mult * _conv_flops(eqn)
        elif prim == "scan":
            _count(eqn.params["jaxpr"].jaxpr, mult * eqn.params["length"], acc)
        elif prim == "while":
            # trip count is dynamic: count one body iteration and flag it
            acc["while_seen"] = True
            _count(eqn.params["body_jaxpr"].jaxpr, mult, acc)
        elif prim == "cond":
            # branches are alternatives, not both executed: take the max
            best = 0.0
            for br in eqn.params["branches"]:
                sub = {"flops": 0.0, "while_seen": acc.get("while_seen", False)}
                _count(br.jaxpr, mult, sub)
                best = max(best, sub["flops"])
                acc["while_seen"] = sub["while_seen"]
            acc["flops"] += best
        else:
            # generic higher-order primitives (pjit, remat/checkpoint,
            # custom_jvp/vjp, closed_call, shard_map, custom_partitioning):
            # recurse into every jaxpr-valued param
            for v in eqn.params.values():
                for sub in _iter_jaxprs(v):
                    _count(sub, mult, acc)


def _iter_jaxprs(v: Any):
    if isinstance(v, jax.extend.core.ClosedJaxpr):
        yield v.jaxpr
    elif isinstance(v, jax.extend.core.Jaxpr):
        yield v
    elif isinstance(v, (tuple, list)):
        for x in v:
            yield from _iter_jaxprs(x)


def _shape_sig(eqn) -> str:
    ins = ",".join("x".join(map(str, v.aval.shape)) for v in eqn.invars[:2])
    out = "x".join(map(str, eqn.outvars[0].aval.shape))
    return f"({ins})->{out}"


def _collect(jaxpr, mult: float, rows: dict) -> None:
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim in ("dot_general", "conv_general_dilated"):
            f = (_dot_general_flops(eqn) if prim == "dot_general"
                 else _conv_flops(eqn)) * mult
            key = (prim, _shape_sig(eqn))
            r = rows.setdefault(key, {"flops": 0.0, "count": 0.0})
            r["flops"] += f
            r["count"] += mult
        elif prim == "scan":
            _collect(eqn.params["jaxpr"].jaxpr, mult * eqn.params["length"], rows)
        elif prim == "while":
            _collect(eqn.params["body_jaxpr"].jaxpr, mult, rows)
        elif prim == "cond":
            for br in eqn.params["branches"]:
                _collect(br.jaxpr, mult, rows)
        else:
            for v in eqn.params.values():
                for sub in _iter_jaxprs(v):
                    _collect(sub, mult, rows)


def per_op_flops(fn, *args, **kwargs) -> list[dict]:
    """Per-op analytic breakdown of `fn`'s traced jaxpr: one row per
    (primitive, shape signature), sorted by FLOPs descending. Args may
    be ShapeDtypeStruct trees — tracing never executes, so the 1.1B-
    param flagship step can be analyzed on any host. Used for the
    roofline triage of fusion candidates (VERDICT r4 item 9)."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    rows: dict = {}
    _collect(closed.jaxpr, 1.0, rows)
    out = [
        {"prim": k[0], "sig": k[1], "flops": v["flops"], "count": v["count"]}
        for k, v in rows.items()
    ]
    out.sort(key=lambda r: -r["flops"])
    return out


def count_matmul_flops(fn, *args, **kwargs) -> float:
    """Analytic MXU FLOPs of one call of `fn(*args, **kwargs)` — the sum
    of 2MNK over every dot_general and the conv formula over every
    conv_general_dilated in the traced jaxpr (recursing through scan ×
    length, cond → max branch, pjit/remat/custom_vjp bodies)."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    acc = {"flops": 0.0, "while_seen": False}
    _count(closed.jaxpr, 1.0, acc)
    return acc["flops"]


def analytic_step_flops(step_fn, *args) -> float:
    """Executed matmul/conv FLOPs of a full train step (fwd + bwd + remat
    recompute: the vjp is traced into the jaxpr, so recomputation shows
    up as real equations)."""
    return count_matmul_flops(step_fn, *args)


def analytic_fwd_flops(apply_fn, *args, **kwargs) -> float:
    """Algorithmic forward FLOPs. A standard training step costs ≈3×
    this (forward + grad-wrt-inputs + grad-wrt-weights each cost one
    forward's matmuls)."""
    return count_matmul_flops(apply_fn, *args, **kwargs)
