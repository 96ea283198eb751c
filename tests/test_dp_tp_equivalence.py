"""Sharded (dp×tp) training must be numerically equivalent to
single-device training: same batch, same rng → same loss and same
updated params (global-view jit semantics; XLA only changes WHERE the
math runs)."""
import numpy as np
import pytest

# slow tier: excluded from the quick gate (pytest.ini)
pytestmark = pytest.mark.slow

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


def test_fused_pair_sharded_step_matches_single_device():
    """cfg.fuse_icl_pair under dp4×tp2: the batched sspa pair
    concatenates two batch-sharded activations along the batch axis —
    GSPMD must reshard without changing the math. Loss and updated
    params must equal the SINGLE-DEVICE FUSED step (which the quick
    tier proves equal to the two-call reference form)."""
    cfg = ExperimentConfig(model="icl_unet", patch_size=(16, 16), batch_size=8,
                           labeled_bs=4, max_iterations=10, fuse_icl_pair=True)
    rng = np.random.default_rng(2)
    b = _batch(rng)
    key = jax.random.PRNGKey(11)

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


def test_window_attention_tp_fused_pallas_matches_einsum(monkeypatch):
    """tp>1 with the fused Pallas attention ACTIVE (GSPMD
    custom_partitioning path, interpret mode on the CPU mesh) must match
    the einsum run — the round-2 foot-gun (tp>1 + kernel) is now a
    supported, tested combination. Module-level (the full train step in
    interpret mode is prohibitively slow on CPU): the REAL
    WindowAttention3D with its qkv Dense column-sharded and proj Dense
    row-sharded over the model axis, batch over data — i.e. the exact
    sharding the Megatron rules in parallel/mesh.py produce — value and
    grads."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from icl_tpu.models.swinunetr import WindowAttention3D
    from icl_tpu.ops import flags

    ws, heads, C = (4, 4, 4), 2, 16
    N = 64
    nW, batch = 4, 2
    B_ = batch * nW
    mod = WindowAttention3D(dim=C, window_size=ws, num_heads=heads)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(B_, N, C)), jnp.float32)
    region_ids = jnp.asarray(rng.integers(0, 3, size=(nW, N)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, None, region_ids)

    def loss(p, x):
        out = mod.apply(p, x, None, region_ids)
        return jnp.sum(out ** 2), out

    # einsum reference (default flags on CPU), unsharded
    (l1, o1), g1 = jax.value_and_grad(loss, has_aux=True)(params, x)

    # fused path on a dp2×tp2 mesh
    monkeypatch.setenv("ICL_TPU_PALLAS", "1")
    monkeypatch.setenv("ICL_TPU_PALLAS_INTERPRET", "1")
    mesh = create_mesh(data=2, model=2)
    old_n = flags.mesh_device_count()
    flags.set_mesh_device_count(mesh.devices.size)
    try:
        def put(tree, path_specs):
            flat = jax.tree_util.tree_map_with_path(
                lambda kp, v: jax.device_put(
                    v, NamedSharding(mesh, path_specs(
                        "/".join(getattr(k, "key", str(k)) for k in kp), v))),
                tree)
            return flat

        def spec_for(name, v):
            if name.startswith("params/qkv/") and name.endswith("kernel"):
                return P(None, "model")
            if name.startswith("params/qkv/") and name.endswith("bias"):
                return P("model")
            if name.startswith("params/proj/") and name.endswith("kernel"):
                return P("model", None)
            return P()

        sp = put(params, spec_for)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        (l2, o2), g2 = jax.jit(
            jax.value_and_grad(loss, has_aux=True))(sp, xs)

        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                                   atol=3e-5, rtol=1e-5)
        assert abs(float(l1) - float(l2)) < 1e-3 * max(1.0, abs(float(l1)))
        flat1 = jax.tree_util.tree_leaves_with_path(g1)
        flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
        for kp, v1 in flat1:
            np.testing.assert_allclose(
                np.asarray(flat2[kp]), np.asarray(v1), atol=5e-4, rtol=5e-4,
                err_msg=str(kp))
    finally:
        flags.set_mesh_device_count(old_n)
