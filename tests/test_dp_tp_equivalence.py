"""Sharded (dp×tp) training must be numerically equivalent to
single-device training: same batch, same rng → same loss and same
updated params (global-view jit semantics; XLA only changes WHERE the
math runs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icl_tpu.config import ExperimentConfig
from icl_tpu.parallel.mesh import batch_sharding, create_mesh
from icl_tpu.train.trainer import Trainer


def _batch(rng):
    return {
        "image": rng.normal(size=(8, 16, 16, 1)).astype(np.float32),
        "label": rng.integers(0, 4, size=(8, 16, 16)).astype(np.int32),
    }


def test_sharded_step_matches_single_device():
    cfg = ExperimentConfig(model="icl_unet", patch_size=(16, 16), batch_size=8,
                           labeled_bs=4, max_iterations=10)
    rng = np.random.default_rng(0)
    b = _batch(rng)
    key = jax.random.PRNGKey(7)

    # single device
    tr1 = Trainer(cfg)
    s1 = tr1.init_state(jax.random.PRNGKey(0))
    s1, m1 = tr1.step_jit(s1, {k: jnp.asarray(v) for k, v in b.items()}, key)

    # dp=4 × tp=2 mesh
    mesh = create_mesh(data=4, model=2)
    tr2 = Trainer(cfg, mesh=mesh)
    s2 = tr2.init_state(jax.random.PRNGKey(0))
    db = {k: jax.device_put(v, batch_sharding(mesh)) for k, v in b.items()}
    s2, m2 = tr2.step_jit(s2, db, key)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4, (
        float(m1["loss"]), float(m2["loss"])
    )
    # updated params agree (spot-check a conv kernel and a TP-sharded mlp2)
    p1 = np.asarray(jax.device_get(
        s1.params["decoder"]["out_conv"]["Conv_0"]["kernel"]))
    p2 = np.asarray(jax.device_get(
        s2.params["decoder"]["out_conv"]["Conv_0"]["kernel"]))
    np.testing.assert_allclose(p1, p2, atol=5e-5)
    m1k = np.asarray(jax.device_get(
        s1.params["sspa"]["class_decoder0"]["mlp2"]["fc1"]["Dense_0"]["kernel"]))
    m2k = np.asarray(jax.device_get(
        s2.params["sspa"]["class_decoder0"]["mlp2"]["fc1"]["Dense_0"]["kernel"]))
    np.testing.assert_allclose(m1k, m2k, atol=5e-5)
