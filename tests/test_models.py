"""Model structure/shape/behavior tests (small shapes — CPU compile)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icl_tpu.models.registry import net_factory


@pytest.fixture(scope="module")
def unet_and_vars():
    m = net_factory("unet", 1, 4)
    x = jnp.zeros((2, 16, 16, 1))
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=True)
    return m, v


def test_unet_shapes(unet_and_vars):
    m, v = unet_and_vars
    out = m.apply(v, jnp.zeros((2, 16, 16, 1)), train=False)
    assert out.shape == (2, 16, 16, 4)


def test_unet_eval_deterministic(unet_and_vars):
    m, v = unet_and_vars
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 1)), jnp.float32)
    a = m.apply(v, x, train=False)
    b = m.apply(v, x, train=False)
    assert jnp.allclose(a, b)


def test_unet_batch_stats_update(unet_and_vars):
    m, v = unet_and_vars
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 1)), jnp.float32)
    _, mut = m.apply(v, x, train=True, mutable=["batch_stats"],
                     rngs={"dropout": jax.random.key(2)})
    old = jax.tree.leaves(v["batch_stats"])
    new = jax.tree.leaves(mut["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


@pytest.fixture(scope="module")
def icl_and_vars():
    m = net_factory("icl_unet", 1, 4, patch_size=16)
    xl = jnp.zeros((2, 16, 16, 1))
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
               xl, xl, train=True)
    return m, v


@pytest.mark.slow
def test_icl_output_contract(icl_and_vars):
    """5-tuple (out_lab, out_unlab, fm_lab, fm_unlab, fm_consisunlab)
    (unet_icl.py:237-252); feat maps at (P/8, P/4, P/2)."""
    m, v = icl_and_vars
    xl = jnp.zeros((2, 16, 16, 1))
    xu = jnp.zeros((3, 16, 16, 1))  # unlabeled sub-batch may differ
    outs, _ = m.apply(v, xl, xu, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.key(2)})
    out_lab, out_unlab, fm_lab, fm_unlab, fm_consis = outs
    assert out_lab.shape == (2, 16, 16, 4)
    assert out_unlab.shape == (3, 16, 16, 4)
    assert [f.shape for f in fm_lab] == [(2, 2, 2, 4), (2, 4, 4, 4), (2, 8, 8, 4)]
    assert [f.shape for f in fm_unlab] == [(3, 2, 2, 4), (3, 4, 4, 4), (3, 8, 8, 4)]
    assert [f.shape for f in fm_consis] == [(3, 2, 2, 4), (3, 4, 4, 4), (3, 8, 8, 4)]


def test_icl_inference_path(icl_and_vars):
    m, v = icl_and_vars
    out = m.apply(v, jnp.zeros((1, 16, 16, 1)), train=False, inference=True)
    assert out.shape == (1, 16, 16, 4)


def test_icl_guided_q_zeros(icl_and_vars):
    _, v = icl_and_vars
    gq = v["params"]["sspa"]["guided_Q"]
    assert gq.shape == (1, 4, 128)
    assert np.all(np.asarray(gq) == 0)


@pytest.mark.slow
def test_icl_grads_flow(icl_and_vars):
    """Consistency loss must send gradients into the USCL head and the
    encoder (labeled targets detached)."""
    m, v = icl_and_vars
    from icl_tpu import losses

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 1)), jnp.float32)

    def loss_fn(params):
        outs, _ = m.apply({"params": params, "batch_stats": v["batch_stats"]},
                          x, x, train=True, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.key(3)})
        return losses.softmax_mse_loss(outs[3], outs[4])

    grads = jax.grad(loss_fn)(v["params"])
    uscl_norm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads["uscl"]))
    assert uscl_norm > 0
