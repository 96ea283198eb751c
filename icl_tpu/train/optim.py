"""Optimizer: SGD + momentum + weight decay + per-step poly LR.

Matches the reference exactly (train_inherent_consistent_unet_2D.py:97-98,
132-134): torch SGD(momentum=0.9, weight_decay=1e-4) applies wd to ALL
params (incl. norms/biases) *before* the momentum buffer, and the LR is
poly-decayed `base_lr·(1−iter/max_iter)^0.9` re-set every iteration.
In JAX the schedule is a traced function of the optax step count, so the
whole update lives inside the jitted train step.

`make_sgd(..., state_dtype="bfloat16")` is the round-5 bandwidth
optimization (docs/ROOFLINE.md §4): the flagship step is HBM-bound on
its 8.55 GiB f32 train state (params + momentum must be read AND
written every step). Storing both in bf16 halves the optimizer traffic
and removes the per-use f32→bf16 weight casts. All update MATH stays
f32 (upcast inside the fused step); the bf16 stores use STOCHASTIC
ROUNDING so sub-quantum updates (lr·buf below ~0.4 % of the param
magnitude) apply in expectation instead of vanishing under
round-to-nearest — the standard recipe for bf16-weight SGD training.
The f32 parity mode is untouched.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def poly_lr_schedule(base_lr: float, max_iterations: int, power: float = 0.9):
    """lr(count) = base_lr·(1−count/max_iterations)^power.

    optax calls the schedule with the pre-increment count, so update k
    (1-indexed) uses (1−(k−1)/max)^p — identical to the reference, which
    sets the lr for step k+1 *after* step k using iter_num=k."""

    def schedule(count):
        frac = 1.0 - jnp.asarray(count, jnp.float32) / max_iterations
        return base_lr * jnp.maximum(frac, 0.0) ** power

    return schedule


def stochastic_round_bf16(x: jax.Array, key: jax.Array) -> jax.Array:
    """f32 → bf16 with stochastic rounding: add uniform bits below the
    bf16 mantissa, truncate. E[result] == x; sub-ulp signals survive in
    expectation (round-to-nearest would drop them every step).

    Noise comes from XLA's native RngBitGenerator, NOT jax.random.bits:
    threefry is ~dozens of VPU ops per draw, and at the flagship's 2.3 B
    draws/step it cost more than the bandwidth the bf16 state saved
    (measured round 5: bf16-state p50 189 ms vs f32-state 171 ms in the
    same window, BENCH r5 manual run). The counter-based native
    generator fuses into the store and keeps SR effectively free; SR
    only needs uniform 16-bit dither, not cryptographic streams. `key`
    (a standard PRNG key, one per leaf per step) seeds the 128-bit
    generator state."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    kd = key if jnp.issubdtype(key.dtype, jnp.integer) else jax.random.key_data(key)
    kd = kd.reshape(-1).astype(jnp.uint32)
    st = jnp.concatenate([kd, kd ^ jnp.uint32(0x9E3779B9)])[:4]
    _, noise = jax.lax.rng_bit_generator(st, bits.shape, dtype=jnp.uint32)
    trunc = (bits + (noise & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(trunc, jnp.float32).astype(jnp.bfloat16)


class SGDBf16State(NamedTuple):
    count: jax.Array  # int32 update counter (drives the poly schedule)
    key: jax.Array    # PRNG for the stochastic-rounding stores
    trace: optax.Params  # momentum buffers, stored in the params' dtype


def _sgd_bf16_state(base_lr, max_iterations, momentum, weight_decay, power,
                    seed: int = 0) -> optax.GradientTransformation:
    """torch-order SGD with bf16-stored momentum and stochastically
    rounded bf16 param stores. Returned `updates` are exact f32 deltas
    `new_p − p` where new_p is the SR-rounded bf16 target, so the
    standard `optax.apply_updates(p, u)` (f32 add, cast to p.dtype)
    reconstructs new_p bit-exactly — the optax interface is preserved."""
    sched = poly_lr_schedule(base_lr, max_iterations, power)

    def init(params):
        return SGDBf16State(
            count=jnp.zeros((), jnp.int32),
            key=jax.random.PRNGKey(seed),
            trace=jax.tree.map(lambda p: jnp.zeros_like(p), params),
        )

    def update(grads, state, params):
        lr = sched(state.count)
        key = jax.random.fold_in(state.key, state.count)
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(key, 2 * len(leaves))

        def upd(i, g, p, buf):
            g32 = g.astype(jnp.float32) + weight_decay * p.astype(jnp.float32)
            buf32 = momentum * buf.astype(jnp.float32) + g32
            p32 = p.astype(jnp.float32)
            new_p32 = p32 - lr * buf32
            if p.dtype == jnp.bfloat16:
                new_buf = stochastic_round_bf16(buf32, keys[2 * i])
                new_p = stochastic_round_bf16(new_p32, keys[2 * i + 1])
                # delta of two bf16-representable values: apply_updates'
                # f32 add + RNE cast lands exactly on new_p
                delta = new_p.astype(jnp.float32) - p32
            else:
                new_buf = buf32.astype(buf.dtype)
                delta = (new_p32 - p32).astype(p.dtype)
            return delta, new_buf

        g_l = jax.tree.leaves(grads)
        b_l = jax.tree.leaves(state.trace)
        outs = [upd(i, g, p, b) for i, (g, p, b) in enumerate(zip(g_l, leaves, b_l))]
        updates = jax.tree.unflatten(treedef, [o[0] for o in outs])
        new_trace = jax.tree.unflatten(treedef, [o[1] for o in outs])
        return updates, SGDBf16State(
            count=state.count + 1, key=state.key, trace=new_trace
        )

    return optax.GradientTransformation(init, update)


def make_sgd(
    base_lr: float,
    max_iterations: int,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    power: float = 0.9,
    state_dtype: str = "float32",
) -> optax.GradientTransformation:
    """torch-equivalent chain: g += wd·p; buf = m·buf + g; p -= lr·buf.

    state_dtype="bfloat16": momentum follows the (bf16) param dtype and
    both stores use stochastic rounding — see module docstring."""
    if state_dtype == "bfloat16":
        return _sgd_bf16_state(
            base_lr, max_iterations, momentum, weight_decay, power
        )
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(poly_lr_schedule(base_lr, max_iterations, power)),
    )
