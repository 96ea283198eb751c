"""bf16 train-state mode (docs/ROOFLINE.md §4): stochastic-rounding
stores, torch-order SGD math in f32, optax interface preserved."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from icl_tpu.config import ExperimentConfig
from icl_tpu.train.optim import make_sgd, stochastic_round_bf16


def test_stochastic_round_exact_on_representable():
    x = jnp.asarray([0.5, -1.25, 3.0, 0.0], jnp.float32)  # bf16-exact
    out = stochastic_round_bf16(x, jax.random.PRNGKey(0))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(out, np.float32), np.asarray(x))


def test_stochastic_round_unbiased():
    # a value exactly between two bf16 neighbours must round up ~half
    # the time; E[SR(x)] == x
    lo = np.float32(np.asarray(jnp.asarray(1.0, jnp.bfloat16)))
    hi = np.float32(np.asarray(jnp.nextafter(jnp.asarray(1.0, jnp.bfloat16),
                                             jnp.asarray(2.0, jnp.bfloat16))))
    x = jnp.full((4096,), (lo + hi) / 2.0, jnp.float32)
    out = stochastic_round_bf16(x, jax.random.PRNGKey(1))
    vals = np.asarray(out, np.float32)
    frac_hi = float((vals == hi).mean())
    assert 0.4 < frac_hi < 0.6, frac_hi
    mean = vals.mean()
    assert abs(mean - (lo + hi) / 2.0) < (hi - lo) * 0.05


def test_stochastic_round_accumulates_subquantum_updates():
    """The motivating property: adding an update far below the bf16 ulp
    every step must still move the param in expectation (RNE would be a
    no-op forever)."""
    p = jnp.full((8192,), 1.0, jnp.bfloat16)
    ulp = np.float32(np.asarray(jnp.nextafter(
        jnp.asarray(1.0, jnp.bfloat16), jnp.asarray(2.0, jnp.bfloat16)))) - 1.0
    delta = ulp / 16.0  # 1/16 of a quantum per step
    for i in range(32):
        p32 = p.astype(jnp.float32) + delta
        p = stochastic_round_bf16(p32, jax.random.PRNGKey(i))
    drift = float(np.asarray(p, np.float32).mean()) - 1.0
    expect = 32 * float(delta)
    assert 0.5 * expect < drift < 1.5 * expect, (drift, expect)


def _run_sgd(tx, params, grads_seq):
    opt = tx.init(params)
    for g in grads_seq:
        updates, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, updates)
    return params


def test_bf16_sgd_tracks_f32_reference():
    """20 updates of the bf16-state SGD on bf16 params must land within
    a few bf16 ulps of the f32 torch-order SGD on f32 params (same
    schedule, momentum, wd)."""
    rng = np.random.default_rng(0)
    p32 = {"w": jnp.asarray(rng.normal(0, 0.05, size=(64,)), jnp.float32)}
    p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p32)
    grads = [
        {"w": jnp.asarray(rng.normal(0, 0.01, size=(64,)), jnp.float32)}
        for _ in range(20)
    ]
    tx32 = make_sgd(0.01, 100)
    tx16 = make_sgd(0.01, 100, state_dtype="bfloat16")
    out32 = _run_sgd(tx32, p32, grads)
    out16 = _run_sgd(tx16, p16, [
        jax.tree.map(lambda g: g.astype(jnp.bfloat16), g) for g in grads
    ])
    a = np.asarray(out32["w"], np.float32)
    b = np.asarray(out16["w"], np.float32)
    # bf16 relative quantum ~0.4%; after 20 steps allow a few quanta
    np.testing.assert_allclose(a, b, atol=3e-3, rtol=2e-2)


def test_bf16_sgd_poly_schedule_decays():
    """The poly schedule must advance with the internal count (the
    custom transformation carries its own counter)."""
    p = {"w": jnp.zeros((4,), jnp.bfloat16)}
    g = {"w": jnp.ones((4,), jnp.bfloat16)}
    tx = make_sgd(0.01, max_iterations=10, momentum=0.0, weight_decay=0.0,
                  state_dtype="bfloat16")
    opt = tx.init(p)
    u1, opt = tx.update(g, opt, p)
    p = optax.apply_updates(p, u1)
    u2, opt = tx.update(g, opt, p)
    # lr(0)=0.01, lr(1)=0.01*(0.9)^0.9 < 0.01
    m1 = float(np.abs(np.asarray(u1["w"], np.float32)).mean())
    m2 = float(np.abs(np.asarray(u2["w"], np.float32)).mean())
    assert m1 == pytest.approx(0.01, rel=0.01)
    assert m2 < m1


def test_trainer_bf16_state_trains_and_checkpoints(tmp_path):
    """End-to-end: bf16-state trainer on a tiny supervised unet — params
    and momentum stored bf16, losses finite and decreasing-ish, full
    state checkpoint roundtrips losslessly."""
    from icl_tpu.train.trainer import Trainer
    from icl_tpu.utils import checkpoint as ckpt

    cfg = ExperimentConfig(
        model="unet", patch_size=(16, 16), batch_size=4, labeled_bs=2,
        max_iterations=50, state_dtype="bfloat16",
    )
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    assert all(
        l.dtype == jnp.bfloat16
        for l in jax.tree.leaves(state.params)
        if jnp.issubdtype(l.dtype, jnp.floating)
    )
    assert all(
        l.dtype == jnp.bfloat16
        for l in jax.tree.leaves(state.opt_state.trace)
    )
    rng = np.random.default_rng(3)
    losses = []
    batch = {
        "image": jnp.asarray(rng.normal(size=(4, 16, 16, 1)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 4, size=(4, 16, 16)), jnp.int32),
    }
    base = jax.random.PRNGKey(1)
    for _ in range(12):
        state, m = tr.step_auto(state, batch, base)
        losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    path = ckpt.save_train_state(str(tmp_path), state)
    restored = ckpt.load_train_state(str(tmp_path), state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_bf16_state_icl_step():
    """The flagship semi-supervised step (double forward + 3 ICL heads +
    consis losses) must run with bf16 params — mixed-dtype einsums and
    the scan/auto-rng plumbing included."""
    from icl_tpu.train.trainer import Trainer

    cfg = ExperimentConfig(
        model="icl_unet", patch_size=(32, 32), batch_size=4, labeled_bs=2,
        max_iterations=50, state_dtype="bfloat16", precision="bfloat16",
    )
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    batch = {
        "image": jnp.asarray(rng.normal(size=(4, 32, 32, 1)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 4, size=(4, 32, 32)), jnp.int32),
    }
    base = jax.random.PRNGKey(2)
    l0 = None
    for _ in range(6):
        state, m = tr.step_auto(state, batch, base)
        l = float(m["loss"])
        assert np.isfinite(l)
        l0 = l0 if l0 is not None else l
    assert l < l0


@pytest.mark.slow
def test_bf16_state_convergence_matches_f32(tmp_path):
    """Convergence evidence for the fast mode: 120 iters of supervised
    unet on a synthetic task — the bf16-state loss trajectory must track
    the f32-state one (end loss within 15%)."""
    from icl_tpu.train.trainer import Trainer

    rng = np.random.default_rng(11)
    img = rng.normal(size=(8, 32, 32, 1)).astype(np.float32)
    lab = (img[..., 0] > 0.5).astype(np.int32) + (img[..., 0] > 1.0)

    def run(state_dtype):
        cfg = ExperimentConfig(
            model="unet", patch_size=(32, 32), batch_size=8, labeled_bs=4,
            num_classes=3, max_iterations=120, state_dtype=state_dtype,
        )
        tr = Trainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0))
        batch = {"image": jnp.asarray(img), "label": jnp.asarray(lab)}
        base = jax.random.PRNGKey(1)
        losses = []
        for _ in range(120):
            state, m = tr.step_auto(state, batch, base)
            losses.append(float(m["loss"]))
        return losses

    l32 = run("float32")
    l16 = run("bfloat16")
    assert l32[-1] < 0.7 * l32[0]  # the task actually trains
    assert abs(l16[-1] - l32[-1]) < 0.15 * l32[0], (l16[-1], l32[-1])


def test_config_rejects_bf16_state_with_grad_accum():
    with pytest.raises(ValueError, match="state_dtype"):
        ExperimentConfig(state_dtype="bfloat16", grad_accum=2)
    with pytest.raises(ValueError, match="state_dtype"):
        ExperimentConfig(state_dtype="float16")
