"""cfg.grad_accum (optax.MultiSteps wrapping, trainer.py:74-77) —
VERDICT r3 item 5: the knob was live but unverified.

Contract verified here:
  * k micro-steps on the SAME batch with grad_accum=k ≡ ONE optimizer
    update with grad_accum=1 (mean of k identical grads = the grad);
    checked across TWO full updates so momentum carries over correctly.
  * params are FROZEN during micro-steps 1..k-1 (MultiSteps emits zero
    updates until the window closes).
  * the poly LR steps per UPDATE, not per micro-step (falls out of the
    two-update equivalence: update 2 must use lr(count=1), which only
    happens if the inner schedule count advanced once per window).
  * grad_accum composes with cfg.scan_steps: scanning 2k micro-steps in
    one dispatch ≡ 2k per-step dispatches.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icl_tpu.config import ExperimentConfig
from icl_tpu.train.trainer import Trainer

K = 2


def _cfg(**kw):
    base = dict(model="unet", patch_size=(16, 16), batch_size=4,
                labeled_bs=2, num_classes=4, max_iterations=100, seed=0)
    base.update(kw)
    return ExperimentConfig(**base)


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": jnp.asarray(rng.normal(size=(4, 16, 16, 1)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 4, size=(4, 16, 16)), jnp.int32),
    }


def _max_param_diff(a, b):
    return max(
        float(jnp.max(jnp.abs(x - y)))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_grad_accum_two_update_equivalence():
    batch = _batch()
    rng = jax.random.PRNGKey(7)  # same dropout mask every micro-step

    acc = Trainer(_cfg(grad_accum=K))
    s_acc = acc.init_state(jax.random.PRNGKey(0))
    ref = Trainer(_cfg(grad_accum=1))
    s_ref = ref.init_state(jax.random.PRNGKey(0))
    p0 = jax.device_get(s_acc.params)

    for upd in range(2):
        # micro-steps 1..K-1 must leave params untouched
        for micro in range(K - 1):
            s_acc, _ = acc.step_jit(s_acc, batch, rng)
            assert _max_param_diff(s_acc.params, p0 if upd == 0 else p_prev) == 0.0
        s_acc, _ = acc.step_jit(s_acc, batch, rng)  # window closes: update fires
        s_ref, _ = ref.step_jit(s_ref, batch, rng)
        p_prev = jax.device_get(s_acc.params)
        diff = _max_param_diff(s_acc.params, s_ref.params)
        assert diff < 1e-6, f"update {upd}: {diff}"
        # and the update actually moved the params
        assert _max_param_diff(s_acc.params, p0) > 0


def test_grad_accum_composes_with_scan():
    """scan_steps over 2K micro-steps ≡ 2K per-step dispatches with the
    same grad_accum (both derive per-step RNG from state.step)."""
    batch = _batch(1)
    base_rng = jax.random.PRNGKey(3)
    n = 2 * K

    a = Trainer(_cfg(grad_accum=K, scan_steps=n))
    s_a = a.init_state(jax.random.PRNGKey(0))
    stacked = jax.tree.map(lambda x: jnp.stack([x] * n), batch)
    s_a, ms = a.scan_step(n)(s_a, {}, stacked, base_rng)
    assert ms["loss"].shape == (n,)

    b = Trainer(_cfg(grad_accum=K))
    s_b = b.init_state(jax.random.PRNGKey(0))
    for _ in range(n):
        s_b, _ = b.step_auto(s_b, batch, base_rng)

    assert int(s_a.step) == int(s_b.step) == n
    assert _max_param_diff(s_a.params, s_b.params) < 1e-6


@pytest.mark.slow  # 17 s; grad_accum stays quick-gated via the
# two-update-equivalence and scan-composition tests above
def test_grad_accum_update_is_mean_of_micro_batch_grads():
    """The EXACT MultiSteps contract on distinct micro-batches: the
    accumulated update equals one optimizer update taken with the MEAN
    of the per-micro-batch gradients. SGD+momentum's first update is
    linear in the gradient (trace=g, update=-lr·(g+wd·p0), p0 shared),
    so mean over k of the per-micro-batch single-step param deltas from
    the same init == the grad_accum=k delta, bitwise up to float assoc.

    Note this is deliberately NOT "≡ one full-batch step": the UNet has
    BatchNorm, whose normalization statistics are computed per
    micro-batch, so full-batch gradients genuinely differ — the same
    caveat grad accumulation has in torch (docs/SCALING.md)."""
    full = _batch(2)
    halves = [
        {k: v[i * 2:(i + 1) * 2] for k, v in full.items()} for i in range(K)
    ]
    rng = jax.random.PRNGKey(11)

    acc = Trainer(_cfg(grad_accum=K, batch_size=2, labeled_bs=1))
    s_acc = acc.init_state(jax.random.PRNGKey(0))
    for h in halves:
        s_acc, _ = acc.step_jit(s_acc, h, rng)

    # reference: mean of independent single-micro-batch updates from the
    # SAME init (linear in grad for the first SGD+momentum update)
    ref = Trainer(_cfg(grad_accum=1, batch_size=2, labeled_bs=1))
    p0 = jax.device_get(ref.init_state(jax.random.PRNGKey(0)).params)
    deltas = []
    for h in halves:
        s_h, _ = ref.step_jit(ref.init_state(jax.random.PRNGKey(0)), h, rng)
        deltas.append(jax.tree.map(lambda a, b: a - b, s_h.params, p0))
    expected = jax.tree.map(
        lambda p, *ds: p + sum(ds) / len(ds), p0, *deltas
    )

    diff = _max_param_diff(s_acc.params, expected)
    assert diff < 1e-6, diff
    # and the accumulated update actually moved the params
    assert _max_param_diff(s_acc.params, p0) > 0
