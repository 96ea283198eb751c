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
