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


def test_swinunetr_icl_sharded_step_matches_single_device():
    """dp4×tp2 SwinUNETR-ICL (VERDICT r1 item 6): the Swin qkv/proj/mlp +
    UNETR conv TP rules must not change the math. Tiny 32³ config,
    feature_size 12 (heads 3/6/12/24 all divisible by tp=2)."""
    cfg = ExperimentConfig(
        model="swinunetr_icl", patch_size=(32, 32, 32), batch_size=4,
        labeled_bs=2, num_classes=2, max_iterations=10, consis_weight=10.0,
        model_kwargs={"feature_size": 12, "window_size": (4, 4, 4)},
    )
    rng = np.random.default_rng(1)
    b = {
        "image": rng.normal(size=(4, 32, 32, 32, 1)).astype(np.float32),
        "label": rng.integers(0, 2, size=(4, 32, 32, 32)).astype(np.int32),
    }
    key = jax.random.PRNGKey(3)

    tr1 = Trainer(cfg)
    s1 = tr1.init_state(jax.random.PRNGKey(0))
    s1, m1 = tr1.step_jit(s1, {k: jnp.asarray(v) for k, v in b.items()}, key)

    mesh = create_mesh(data=4, model=2)
    tr2 = Trainer(cfg, mesh=mesh)
    s2 = tr2.init_state(jax.random.PRNGKey(0))
    db = {k: jax.device_put(v, batch_sharding(mesh)) for k, v in b.items()}
    s2, m2 = tr2.step_jit(s2, db, key)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4, (
        float(m1["loss"]), float(m2["loss"])
    )
    # spot-check updated TP-sharded leaves: a Swin qkv kernel and a
    # UNETR encoder10 conv kernel
    def leaf(s, *path):
        node = s.params
        for k in path:
            node = node[k]
        return np.asarray(jax.device_get(node))

    for path in (
        ("backbone", "swinViT", "layers1_blocks", "blocks", "attn", "qkv",
         "Dense_0", "kernel"),
        ("backbone", "encoder10", "conv1", "Conv_0", "kernel"),
        ("backbone", "out", "Conv_0", "kernel"),
    ):
        np.testing.assert_allclose(leaf(s1, *path), leaf(s2, *path),
                                   atol=5e-5, err_msg="/".join(path))
