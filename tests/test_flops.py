"""Analytic FLOPs counter (utils/flops.py): hand-checkable cases plus
the trainer-step 3×-forward sanity bound used by bench.py's MFU
cross-check (VERDICT r3 item 3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icl_tpu.utils.flops import analytic_fwd_flops, analytic_step_flops, count_matmul_flops


def test_plain_matmul():
    a = jnp.zeros((8, 32))
    b = jnp.zeros((32, 16))
    assert count_matmul_flops(jnp.dot, a, b) == 2 * 8 * 16 * 32


def test_batched_einsum():
    a = jnp.zeros((4, 8, 32))
    b = jnp.zeros((4, 32, 16))
    f = lambda x, y: jnp.einsum("bmk,bkn->bmn", x, y)
    assert count_matmul_flops(f, a, b) == 2 * 4 * 8 * 16 * 32


def test_conv2d():
    # NHWC conv, SAME padding: out 2*H*W*Cout*Cin*kh*kw
    import flax.linen as nn

    conv = nn.Conv(features=16, kernel_size=(3, 3), padding="SAME")
    x = jnp.zeros((2, 8, 8, 4))
    params = conv.init(jax.random.PRNGKey(0), x)
    got = count_matmul_flops(conv.apply, params, x)
    assert got == 2 * 2 * 8 * 8 * 16 * 4 * 3 * 3


def test_scan_multiplies_by_length():
    w = jnp.zeros((16, 16))

    def f(x):
        def body(c, _):
            return c @ w, None

        y, _ = jax.lax.scan(body, x, None, length=5)
        return y

    x = jnp.zeros((8, 16))
    assert count_matmul_flops(f, x) == 5 * 2 * 8 * 16 * 16


def test_grad_counts_backward():
    # d(x@w) needs grad-wrt-x (y_bar @ w.T) and grad-wrt-w (x.T @ y_bar):
    # 3x the forward matmul flops total
    w = jnp.zeros((16, 16))
    x = jnp.zeros((8, 16))
    fwd = lambda w, x: jnp.sum(x @ w)
    f1 = count_matmul_flops(fwd, w, x)
    f3 = count_matmul_flops(jax.grad(fwd, argnums=(0, 1)), w, x)
    assert f1 == 2 * 8 * 16 * 16
    assert f3 == 3 * f1


def test_remat_recompute_is_counted():
    w = jnp.zeros((16, 16))
    x = jnp.zeros((8, 16))

    def fwd(w, x):
        h = jax.checkpoint(lambda a: jnp.tanh(a @ w))(x)
        return jnp.sum(h @ w)

    plain = count_matmul_flops(jax.grad(fwd, argnums=0), w, x)

    def fwd_nockpt(w, x):
        h = jnp.tanh(x @ w)
        return jnp.sum(h @ w)

    base = count_matmul_flops(jax.grad(fwd_nockpt, argnums=0), w, x)
    # the checkpointed version re-runs the first matmul in the bwd pass
    assert plain == base + 2 * 8 * 16 * 16


@pytest.mark.slow
@pytest.mark.parametrize("model", ["icl_unet"])
def test_trainer_step_near_3x_forward(model):
    """Full ICL train step: executed matmul flops within [2.5x, 4.5x] of
    the two forwards (labeled+unlabeled share one forward here; bwd adds
    ~2x; ICL aux heads add a bit)."""
    from icl_tpu.config import ExperimentConfig
    from icl_tpu.train.trainer import Trainer

    cfg = ExperimentConfig(
        model=model, patch_size=(64, 64), batch_size=4, labeled_bs=2,
        max_iterations=100,
    )
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    batch = {
        "image": jnp.zeros((4, 64, 64, 1)),
        "label": jnp.zeros((4, 64, 64), jnp.int32),
    }
    rng = jax.random.PRNGKey(1)
    step_f = analytic_step_flops(tr.step_auto, state, batch, rng)

    xl = jnp.zeros((2, 64, 64, 1))
    xu = jnp.zeros((2, 64, 64, 1))
    fwd_f = analytic_fwd_flops(
        lambda p, a, b: tr.model.apply(
            {"params": p, "batch_stats": state.batch_stats}, a, b,
            train=True, rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"],
        ),
        state.params, xl, xu,
    )
    assert fwd_f > 0 and step_f > 0
    ratio = step_f / fwd_f
    assert 2.5 < ratio < 4.5, ratio
    # and the step flops must be far below what a remat double-count
    # would claim (sanity: < 6x forward)
    assert step_f < 6 * fwd_f
