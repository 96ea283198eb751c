"""Periodic checkpoint + resume: a restored TrainState continues from
its saved step with identical parameters."""
import jax
import jax.numpy as jnp
import numpy as np

from icl_tpu.config import ExperimentConfig
from icl_tpu.train.trainer import Trainer


def _batch(rng, n=4, s=16):
    return {
        "image": jnp.asarray(rng.normal(size=(n, s, s, 1)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 4, size=(n, s, s)).astype(np.int32)),
    }


def test_checkpoint_resume_roundtrip(tmp_path):
    cfg = ExperimentConfig(
        model="unet", patch_size=(16, 16), batch_size=4, labeled_bs=2, max_iterations=100,
        experiments_dir=str(tmp_path), exp="resume",
    )
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    for i in range(3):
        state, _ = tr.step_jit(state, _batch(rng), jax.random.PRNGKey(i))

    from icl_tpu.utils.checkpoint import save_train_state

    save_train_state(cfg.snapshot_path, state, name="last")
    saved_leaf = np.asarray(jax.device_get(state.params["decoder"]["out_conv"]["Conv_0"]["kernel"]))

    tr2 = Trainer(cfg)
    fresh = tr2.init_state(jax.random.PRNGKey(42))
    restored = tr2.restore_state(fresh, name="last")
    assert int(jax.device_get(restored.step)) == 3
    np.testing.assert_array_equal(
        np.asarray(restored.params["decoder"]["out_conv"]["Conv_0"]["kernel"]),
        saved_leaf,
    )
    # and training continues
    restored, m = tr2.step_jit(restored, _batch(rng), jax.random.PRNGKey(9))
    assert int(jax.device_get(restored.step)) == 4
    assert np.isfinite(float(m["loss"]))


def test_rolling_checkpoints_prune_to_keep_last_n(tmp_path):
    cfg = ExperimentConfig(
        model="unet", patch_size=(16, 16), batch_size=4, labeled_bs=2, max_iterations=100,
        experiments_dir=str(tmp_path), exp="rolling",
    )
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))

    from icl_tpu.utils import checkpoint as ck

    for step in (10, 20, 30, 40, 50):
        ck.save_train_state_rolling(cfg.snapshot_path, state, step, keep=3)

    import os

    kept = [os.path.basename(p) for p in ck.list_step_checkpoints(cfg.snapshot_path)]
    assert kept == ["state_step_00000030.msgpack", "state_step_00000040.msgpack",
                    "state_step_00000050.msgpack"]
    assert ck.latest_checkpoint_step(cfg.snapshot_path) == 50

    # state_last always tracks the newest -> restore_state(name='last')
    restored = tr.restore_state(tr.init_state(jax.random.PRNGKey(1)), name="last")
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(restored.params["decoder"]["out_conv"]["Conv_0"]["kernel"])),
        np.asarray(jax.device_get(state.params["decoder"]["out_conv"]["Conv_0"]["kernel"])),
    )


def test_async_orbax_saver_roundtrip(tmp_path):
    import numpy as np

    from icl_tpu.utils import checkpoint as ck

    tree = {"params": {"w": np.arange(6.0).reshape(2, 3)},
            "step": np.array(7, np.int32)}
    with ck.AsyncStateSaver() as saver:
        saver.save(str(tmp_path), tree, name="t")  # returns immediately
        saver.wait()
    back = ck.load_train_state_orbax(str(tmp_path), tree, name="t")
    np.testing.assert_array_equal(back["params"]["w"], tree["params"]["w"])
    assert int(back["step"]) == 7


def test_rolling_checkpoints_keep_zero_keeps_everything(tmp_path):
    """keep=0 is defined as no pruning (ADVICE r2: the old [:-0] slice
    silently kept everything; now it's the documented behavior), and
    negative keep is rejected."""
    import pytest

    from icl_tpu.utils import checkpoint as ckpt

    snap = str(tmp_path / "snap")
    state = {"w": np.arange(4, dtype=np.float32)}
    for step in (10, 20, 30, 40):
        ckpt.save_train_state_rolling(snap, state, step, keep=0)
    assert len(ckpt.list_step_checkpoints(snap)) == 4
    with pytest.raises(ValueError):
        ckpt.save_train_state_rolling(snap, state, 50, keep=-1)


def test_streaming_checkpoint_roundtrip(tmp_path):
    """Overlapped-D2H streaming save/restore (utils/checkpoint.py):
    chunked leaves reassemble bit-exactly, small/scalar/np leaves pass
    through, and Trainer.restore_state picks up the .stream dialect."""
    import jax.numpy as jnp

    from icl_tpu.utils import checkpoint as ckpt

    rng = np.random.default_rng(0)
    state = {
        "params": {
            # large leaf: chunked along axis 0 (3 chunks at 1MB chunk)
            "big": jnp.asarray(rng.normal(size=(600, 1024)).astype(np.float32)),
            "small": jnp.asarray(rng.normal(size=(7, 3)).astype(np.float32)),
        },
        "step": jnp.asarray(42, jnp.int32),
        "np_leaf": rng.normal(size=(5,)).astype(np.float64),
    }
    snap = str(tmp_path / "snap")
    out = ckpt.save_train_state_streaming(snap, state, chunk_bytes=1 << 20,
                                          window=2)
    assert out.endswith("state_last.stream")

    target = jax.tree.map(np.zeros_like, jax.device_get(state))
    restored = ckpt.load_train_state_streaming(snap, target)
    got = jax.device_get(state)
    np.testing.assert_array_equal(restored["params"]["big"], got["params"]["big"])
    np.testing.assert_array_equal(restored["params"]["small"], got["params"]["small"])
    assert int(restored["step"]) == 42
    np.testing.assert_array_equal(restored["np_leaf"], got["np_leaf"])


def test_streaming_checkpoint_bf16_cast_roundtrip(tmp_path):
    """cast_dtype='bfloat16' (lossy fallback for slow D2H links): f32
    device leaves are cast on device pre-pull (half the bytes), stored
    as uint16 views, and the loader casts back to float32 transparently
    — values within bf16 quantization; int/np leaves stay exact."""
    import jax.numpy as jnp

    from icl_tpu.utils import checkpoint as ckpt

    rng = np.random.default_rng(1)
    state = {
        "params": {
            "big": jnp.asarray(rng.normal(size=(600, 1024)).astype(np.float32)),
            "small": jnp.asarray(rng.normal(size=(7, 3)).astype(np.float32)),
        },
        "step": jnp.asarray(7, jnp.int32),
        "np_leaf": rng.normal(size=(5,)).astype(np.float64),
    }
    snap = str(tmp_path / "snap")
    ckpt.save_train_state_streaming(snap, state, chunk_bytes=1 << 20,
                                    window=2, cast_dtype="bfloat16")
    # stored files are half-size for the f32 leaves
    import json as _json
    import os as _os

    man = _json.load(open(_os.path.join(
        snap, "model", "state_last.stream", "manifest.json")))
    big = man["leaves"]["params/big"]
    assert big["orig_dtype"] == "float32" and big["stored_as"] == "uint16"

    target = jax.tree.map(np.zeros_like, jax.device_get(state))
    restored = ckpt.load_train_state_streaming(snap, target)
    got = jax.device_get(state)
    assert restored["params"]["big"].dtype == np.float32
    np.testing.assert_allclose(
        restored["params"]["big"], got["params"]["big"], rtol=8e-3)
    np.testing.assert_allclose(
        restored["params"]["small"], got["params"]["small"], rtol=8e-3)
    assert int(restored["step"]) == 7
    np.testing.assert_array_equal(restored["np_leaf"], got["np_leaf"])


def test_rolling_streaming_dialect_and_mixed_pruning(tmp_path):
    """Rolling checkpoints above the streaming threshold write .stream
    dirs with a state_last.stream symlink; msgpack and stream steps
    prune together and the 'last' pointer never goes stale across
    dialect switches (round 3: periodic saves of multi-GB states use the
    overlapped-D2H path)."""
    import os

    from icl_tpu.config import ExperimentConfig
    from icl_tpu.train.trainer import Trainer
    from icl_tpu.utils import checkpoint as ck

    cfg = ExperimentConfig(
        model="unet", patch_size=(16, 16), batch_size=4, labeled_bs=2, max_iterations=100,
        experiments_dir=str(tmp_path), exp="rollstream",
    )
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    snap = cfg.snapshot_path

    # below threshold -> msgpack; forced threshold 0 -> streaming
    ck.save_train_state_rolling(snap, state, 10, keep=2)
    ck.save_train_state_rolling(snap, state, 20, keep=2, streaming_threshold=0)
    kept = [os.path.basename(p) for p in ck.list_step_checkpoints(snap)]
    assert kept == ["state_step_00000010.msgpack", "state_step_00000020.stream"]
    assert ck.latest_checkpoint_step(snap) == 20
    # dialect switch repointed 'last': stream symlink exists, msgpack gone
    model_dir = os.path.join(snap, "model")
    assert os.path.islink(os.path.join(model_dir, "state_last.stream"))
    assert not os.path.exists(os.path.join(model_dir, "state_last.msgpack"))

    # restore via the symlinked stream 'last'
    restored = tr.restore_state(tr.init_state(jax.random.PRNGKey(1)), name="last")
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(
            restored.params["decoder"]["out_conv"]["Conv_0"]["kernel"])),
        np.asarray(jax.device_get(
            state.params["decoder"]["out_conv"]["Conv_0"]["kernel"])),
    )

    # two more streaming steps: keep=2 prunes the msgpack AND the oldest
    # stream dir
    ck.save_train_state_rolling(snap, state, 30, keep=2, streaming_threshold=0)
    ck.save_train_state_rolling(snap, state, 40, keep=2, streaming_threshold=0)
    kept = [os.path.basename(p) for p in ck.list_step_checkpoints(snap)]
    assert kept == ["state_step_00000030.stream", "state_step_00000040.stream"]

    # switching BACK to msgpack repoints 'last' and drops the stale
    # stream symlink
    ck.save_train_state_rolling(snap, state, 50, keep=2)
    assert not os.path.lexists(os.path.join(model_dir, "state_last.stream"))
    assert os.path.exists(os.path.join(model_dir, "state_last.msgpack"))
    restored = tr.restore_state(tr.init_state(jax.random.PRNGKey(2)), name="last")
    assert int(jax.device_get(restored.step)) == int(jax.device_get(state.step))
