"""Multi-device sharding on the virtual 8-CPU mesh: the ICL train step
must compile + run with batch sharded over 'data' and the big ICL
token-MLP weights tensor-sharded over 'model' (SURVEY.md §2.6)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icl_tpu.config import ExperimentConfig
from icl_tpu.parallel.mesh import batch_sharding, create_mesh, param_shardings
from icl_tpu.train.trainer import Trainer


def test_mesh_creation():
    mesh = create_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_param_rules_hit_mlp2():
    cfg = ExperimentConfig(model="icl_unet", patch_size=(16, 16), batch_size=4,
                           labeled_bs=2, max_iterations=10)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    mesh = create_mesh(data=4, model=2)
    sh = param_shardings(state.params, mesh)
    leaves = jax.tree_util.tree_flatten_with_path(sh)[0]
    hit = [
        "/".join(getattr(k, "key", str(k)) for k in path)
        for path, s in leaves
        if s.spec != jax.sharding.PartitionSpec()
    ]
    assert any("mlp2" in h for h in hit), "TP rules must match ICL mlp2 kernels"


@pytest.mark.slow
def test_icl_step_dp_tp():
    n = len(jax.devices())
    assert n == 8, "conftest must provide 8 virtual CPU devices"
    mesh = create_mesh(data=4, model=2)
    cfg = ExperimentConfig(model="icl_unet", patch_size=(16, 16), batch_size=8,
                           labeled_bs=4, max_iterations=10)
    tr = Trainer(cfg, mesh=mesh)
    state = tr.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batch = {
        "image": jax.device_put(
            rng.normal(size=(8, 16, 16, 1)).astype(np.float32), batch_sharding(mesh)
        ),
        "label": jax.device_put(
            rng.integers(0, 4, size=(8, 16, 16)).astype(np.int32), batch_sharding(mesh)
        ),
    }
    state2, metrics = tr.step_jit(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(jax.device_get(state2.step)) == 1
    # params keep their sharding through the update
    mlp2_kernel = state2.params["sspa"]["class_decoder0"]["mlp2"]["fc1"]["Dense_0"]["kernel"]
    assert "model" in str(mlp2_kernel.sharding.spec)


@pytest.mark.slow
def test_scan_step_dp_tp_matches_per_step():
    """cfg.scan_steps under a dp4×tp2 mesh: the scan-fused program on
    sharded state + sharded stacked batches must match per-step dispatch
    (params sharded over 'model' stay sharded through the scan).

    2 steps only: the scanned and standalone programs schedule the mesh
    collectives differently, giving ~1e-7 reduction-order noise per step
    that this tiny random-data config amplifies ~1000×/step through the
    dice-loss denominators from step 3 on (measured: 6e-8, 1.2e-7,
    1.3e-4, 7.5e-4). Two steps keep the check tight (atol 1e-6) while
    still catching wrong RNG streams / batch order / step counts, which
    diverge at ≫1e-3. Longer equivalence runs live in
    test_train_smoke.py where both paths compile identically."""
    mesh = create_mesh(data=4, model=2)
    cfg = ExperimentConfig(model="icl_unet", patch_size=(16, 16), batch_size=8,
                           labeled_bs=4, max_iterations=10)
    tr = Trainer(cfg, mesh=mesh)
    rng = np.random.default_rng(3)
    batches = [
        {
            "image": jax.device_put(
                rng.normal(size=(8, 16, 16, 1)).astype(np.float32),
                batch_sharding(mesh),
            ),
            "label": jax.device_put(
                rng.integers(0, 4, size=(8, 16, 16)).astype(np.int32),
                batch_sharding(mesh),
            ),
        }
        for _ in range(2)
    ]
    base_rng = jax.random.PRNGKey(11)

    state_a = tr.init_state(jax.random.PRNGKey(0))
    for b in batches:
        state_a, ma = tr.step_auto(state_a, b, base_rng)

    state_b = tr.init_state(jax.random.PRNGKey(0))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    state_b, mb = tr.scan_step(2)(state_b, {}, stacked, base_rng)

    assert int(jax.device_get(state_b.step)) == 2
    mlp2 = state_b.params["sspa"]["class_decoder0"]["mlp2"]["fc1"]["Dense_0"]["kernel"]
    assert "model" in str(mlp2.sharding.spec)
    np.testing.assert_allclose(
        float(ma["loss"]), float(jax.device_get(mb["loss"])[-1]), rtol=1e-5
    )
    for la, lb in zip(
        jax.tree.leaves(jax.device_get(state_a.params)),
        jax.tree.leaves(jax.device_get(state_b.params)),
    ):
        np.testing.assert_allclose(la, lb, rtol=2e-5, atol=1e-6)
