"""End-to-end integration: tiny synthetic ACDC, a few train steps, loss
decreases, eval + best-checkpoint round-trip (SURVEY.md §4 item 3)."""
import numpy as np
import pytest

import jax

from icl_tpu.config import ExperimentConfig
from icl_tpu.data.acdc import ACDCDataset
from icl_tpu.data.pipeline import acdc_train_batches, supervised_batches
from icl_tpu.data.synth import make_synthetic_acdc
from icl_tpu.eval.infer2d import evaluate_acdc_volumes, make_slice_predictor
from icl_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ACDC_synth")
    return make_synthetic_acdc(str(root), num_slices=16, num_volumes=2, slice_size=16)


def test_supervised_train_decreases_loss(synth_root, tmp_path):
    cfg = ExperimentConfig(
        root_path=synth_root, model="unet", patch_size=(16, 16), batch_size=4,
        labeled_bs=2, max_iterations=8, val_interval=8, base_lr=0.05,
        experiments_dir=str(tmp_path), exp="smoke", labeled_num=3,
    )
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    ds = ACDCDataset(synth_root, "train")
    batches = supervised_batches(ds, cfg.batch_size, cfg.patch_size, seed=0)

    import jax.numpy as jnp
    lvals = []
    rng = jax.random.PRNGKey(1)
    for i, b in zip(range(8), batches):
        rng, r = jax.random.split(rng)
        db = {"image": jnp.asarray(b["image"]), "label": jnp.asarray(b["label"])}
        state, m = tr.step_jit(state, db, r)
        lvals.append(float(m["loss"]))
    assert lvals[-1] < lvals[0], lvals


def test_icl_full_fit_loop(synth_root, tmp_path):
    cfg = ExperimentConfig(
        root_path=synth_root, model="icl_unet", patch_size=(16, 16), batch_size=4,
        labeled_bs=2, max_iterations=4, val_interval=2, base_lr=0.01,
        experiments_dir=str(tmp_path), exp="smoke_icl", labeled_num=3,
    )
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))

    train_ds = ACDCDataset(synth_root, "train")
    val_ds = ACDCDataset(synth_root, "val_test")
    batches = acdc_train_batches(train_ds, labeled_count=8, batch_size=4,
                                 labeled_bs=2, patch_size=(16, 16), seed=0)
    predict = make_slice_predictor(tr.model, (16, 16), bucket=4)

    def evaluate(variables):
        return evaluate_acdc_volumes(predict, variables, val_ds, cfg.num_classes)

    state = tr.fit(state, batches, evaluate=evaluate)
    assert int(state.step) == 4

    # best-checkpoint contract: ICL heads stripped
    import os
    from flax import serialization

    best = os.path.join(cfg.snapshot_path, "model", "model_best.msgpack")
    assert os.path.exists(best)
    with open(best, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    assert "sspa" not in tree["params"] and "uscl" not in tree["params"]
    assert "encoder" in tree["params"] and "decoder" in tree["params"]

    # offline-eval loading path: stripped ckpt + fresh heads, predict runs
    import jax.numpy as jnp

    from icl_tpu.utils.checkpoint import load_eval_variables

    ev = load_eval_variables(tr.model, best, jnp.zeros((1, 16, 16, 1)))
    pred = predict(ev, val_ds[0]["image"])
    assert pred.shape == val_ds[0]["image"].shape

    # pseudo-label generation path (val_2D.py:89-109 equivalent)
    from icl_tpu.eval.infer2d import generate_pseudo_labels

    n = generate_pseudo_labels(predict, ev, val_ds, synth_root, (16, 16))
    assert n == sum(val_ds[i]["image"].shape[0] for i in range(len(val_ds)))
    import glob
    assert len(glob.glob(os.path.join(synth_root, "slices_iter1", "*.h5"))) == n


def test_device_augment_train_mode(synth_root, tmp_path):
    """cfg.device_augment: raw same-size slices in, augmentation fused
    into the jitted step."""
    from icl_tpu.data.pipeline import acdc_raw_batches

    cfg = ExperimentConfig(
        root_path=synth_root, model="unet", patch_size=(16, 16), batch_size=4,
        labeled_bs=2, max_iterations=4, val_interval=10, base_lr=0.01,
        experiments_dir=str(tmp_path), exp="devaug", labeled_num=3,
        device_augment=True,
    )
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    ds = ACDCDataset(synth_root, "train")
    gen = acdc_raw_batches(ds, labeled_count=8, batch_size=4, labeled_bs=2,
                           canon_size=16, seed=0)
    import jax.numpy as jnp
    rng = jax.random.PRNGKey(1)
    for i, b in zip(range(3), gen):
        assert b["image"].shape == (4, 16, 16)
        rng, r = jax.random.split(rng)
        db = {"image": jnp.asarray(b["image"]), "label": jnp.asarray(b["label"])}
        state, m = tr.step_jit(state, db, r)
        assert np.isfinite(float(m["loss"]))
    assert int(jax.device_get(state.step)) == 3


def test_device_bank_train_mode(synth_root, tmp_path):
    """HBM-resident dataset bank: index batches in, gather + augment on
    device (zero per-step H2D)."""
    from icl_tpu.data.device_bank import build_acdc_bank, two_stream_index_batches

    cfg = ExperimentConfig(
        root_path=synth_root, model="unet", patch_size=(16, 16), batch_size=4,
        labeled_bs=2, max_iterations=4, val_interval=10,
        experiments_dir=str(tmp_path), exp="bank", labeled_num=3,
        device_augment=True,
    )
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    ds = ACDCDataset(synth_root, "train")
    img_bank, lab_bank = build_acdc_bank(ds, 16)
    assert img_bank.shape == (len(ds), 16, 16)

    import jax.numpy as jnp
    idx_gen = two_stream_index_batches(8, len(ds), 4, 2, seed=0)
    rng = jax.random.PRNGKey(1)
    for i, idx in zip(range(3), idx_gen):
        assert (idx[:2] < 8).all() and (idx[2:] >= 8).all()
        rng, r = jax.random.split(rng)
        batch = {"image_bank": img_bank, "label_bank": lab_bank,
                 "indices": jnp.asarray(idx)}
        state, m = tr.step_jit(state, batch, r)
        assert np.isfinite(float(m["loss"]))
    assert int(jax.device_get(state.step)) == 3


def test_eval_volume_shapes(synth_root):
    """Batched slice predictor handles D not divisible by bucket and
    H,W != patch."""
    cfg_model = "unet"
    from icl_tpu.models.registry import net_factory
    import jax.numpy as jnp

    m = net_factory(cfg_model, 1, 4)
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               jnp.zeros((1, 16, 16, 1)), train=True)
    predict = make_slice_predictor(m, (16, 16), bucket=4)
    vol = np.random.default_rng(0).normal(size=(5, 20, 24)).astype(np.float32)
    pred = predict(v, vol)
    assert pred.shape == vol.shape
    assert pred.max() <= 3


def test_scan_step_matches_dispatched_steps(synth_root):
    """cfg.scan_steps fusion contract: scan_step(k) over stacked batches
    produces the SAME state as k individually dispatched step_auto calls
    (per-step RNG = fold_in(base_rng, state.step) in both paths)."""
    import jax.numpy as jnp

    cfg = ExperimentConfig(
        root_path=synth_root, model="unet", patch_size=(16, 16), batch_size=4,
        labeled_bs=2, max_iterations=6, labeled_num=3,
    )
    tr = Trainer(cfg)
    rng = np.random.default_rng(0)
    batches = [
        {
            "image": jnp.asarray(rng.normal(size=(4, 16, 16, 1)), jnp.float32),
            "label": jnp.asarray(rng.integers(0, 4, size=(4, 16, 16)), jnp.int32),
        }
        for _ in range(6)
    ]
    base_rng = jax.random.PRNGKey(7)

    state_a = tr.init_state(jax.random.PRNGKey(0))
    losses_a = []
    for b in batches:
        state_a, m = tr.step_auto(state_a, b, base_rng)
        losses_a.append(float(m["loss"]))
    params_a = jax.device_get(state_a.params)

    state_b = tr.init_state(jax.random.PRNGKey(0))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    state_b, m3 = tr.scan_step(3)(state_b, {}, jax.tree.map(lambda x: x[:3], stacked), base_rng)
    state_b, m3b = tr.scan_step(3)(state_b, {}, jax.tree.map(lambda x: x[3:], stacked), base_rng)
    losses_b = [float(v) for v in np.concatenate([m3["loss"], m3b["loss"]])]
    params_b = jax.device_get(state_b.params)

    assert int(jax.device_get(state_b.step)) == 6
    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-5, atol=1e-6)
    for la, lb in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
        np.testing.assert_allclose(la, lb, rtol=2e-5, atol=1e-6)


def test_fit_scan_steps_equivalent(synth_root, tmp_path):
    """fit() with cfg.scan_steps=4 ≡ scan_steps=1 on identical batch
    streams (incl. an uneven boundary: 6 iters, group sizes 4+2), and
    val/checkpoint cadence is preserved across scan groups."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    raw = [
        {
            "image": rng.normal(size=(4, 16, 16, 1)).astype(np.float32),
            "label": rng.integers(0, 4, size=(4, 16, 16)).astype(np.int32),
        }
        for _ in range(6)
    ]

    def run(scan_steps, exp):
        cfg = ExperimentConfig(
            root_path=synth_root, model="unet", patch_size=(16, 16),
            batch_size=4, labeled_bs=2, max_iterations=6, val_interval=100,
            experiments_dir=str(tmp_path), exp=exp, labeled_num=3,
            scan_steps=scan_steps, checkpoint_interval=0,
        )
        tr = Trainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0))
        state = tr.fit(state, iter(list(raw)))
        return jax.device_get(state)

    s1 = run(1, "scan1")
    s4 = run(4, "scan4")
    assert int(s1.step) == 6 and int(s4.step) == 6
    for la, lb in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s4.params)):
        np.testing.assert_allclose(la, lb, rtol=2e-5, atol=1e-6)


def test_fit_dispatch_depth_equivalent(synth_root, tmp_path):
    """fit() with cfg.dispatch_depth=3 ≡ depth=1 bitwise: only host
    fencing moves, the dispatch sequence is unchanged. Checked on params
    AND the log.txt per-iteration loss lines (the deferred-log backlog
    must drain in exact order at boundaries and at the end), composed
    with scan_steps=2 so group and depth pipelines interact."""
    rng = np.random.default_rng(2)
    raw = [
        {
            "image": rng.normal(size=(4, 16, 16, 1)).astype(np.float32),
            "label": rng.integers(0, 4, size=(4, 16, 16)).astype(np.int32),
        }
        for _ in range(8)
    ]

    def run(depth, exp):
        cfg = ExperimentConfig(
            root_path=synth_root, model="unet", patch_size=(16, 16),
            batch_size=4, labeled_bs=2, max_iterations=8, val_interval=100,
            experiments_dir=str(tmp_path), exp=exp, labeled_num=3,
            scan_steps=2, dispatch_depth=depth, checkpoint_interval=0,
        )
        tr = Trainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0))
        state = tr.fit(state, iter(list(raw)))
        import os
        log_path = os.path.join(cfg.snapshot_path, "log.txt")
        lines = [
            l.split("]", 1)[-1] for l in open(log_path)
            if "iteration" in l and "loss" in l
        ]
        return jax.device_get(state), lines

    s1, log1 = run(1, "depth1")
    s3, log3 = run(3, "depth3")
    assert int(s1.step) == 8 and int(s3.step) == 8
    for la, lb in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s3.params)):
        np.testing.assert_array_equal(la, lb)
    assert len(log1) == 8 and log1 == log3


def test_fit_scan_steps_device_bank_equivalent(synth_root, tmp_path):
    """The flagship perf config: cfg.scan_steps + device_bank input
    (HBM-resident image/label banks are step-invariant CONST leaves —
    only the [k, 16] int32 index stacks scan). scan_steps=3 ≡ 1."""
    import jax.numpy as jnp

    from icl_tpu.data.device_bank import build_acdc_bank
    from icl_tpu.data.acdc import ACDCDataset

    ds = ACDCDataset(synth_root, "train")
    img_bank, lab_bank = build_acdc_bank(ds, canon_size=16)
    rng = np.random.default_rng(5)
    idx_batches = [rng.integers(0, len(ds), size=4).astype(np.int32)
                   for _ in range(6)]

    def run(scan_steps, exp):
        cfg = ExperimentConfig(
            root_path=synth_root, model="unet", patch_size=(16, 16),
            batch_size=4, labeled_bs=2, max_iterations=6, val_interval=100,
            experiments_dir=str(tmp_path), exp=exp, labeled_num=3,
            scan_steps=scan_steps, checkpoint_interval=0, device_augment=True,
        )
        tr = Trainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0))
        batches = ({"image_bank": img_bank, "label_bank": lab_bank,
                    "indices": idx} for idx in idx_batches)
        state = tr.fit(state, batches)
        return jax.device_get(state)

    s1 = run(1, "bank_scan1")
    s3 = run(3, "bank_scan3")
    assert int(s1.step) == 6 and int(s3.step) == 6
    for la, lb in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s3.params)):
        np.testing.assert_allclose(la, lb, rtol=2e-5, atol=1e-6)


def test_fit_scan_steps_checkpoint_boundary(synth_root, tmp_path):
    """Rolling checkpoints must land on EXACT checkpoint_interval
    multiples even when scan_steps doesn't divide them (scan_steps=4,
    interval=3 → group sizes 3,1,2): fit() clamps each scan group at the
    boundary instead of overshooting it."""
    import jax.numpy as jnp

    from icl_tpu.utils.checkpoint import _checkpoint_step_of, list_step_checkpoints

    rng = np.random.default_rng(2)
    raw = [
        {
            "image": rng.normal(size=(4, 16, 16, 1)).astype(np.float32),
            "label": rng.integers(0, 4, size=(4, 16, 16)).astype(np.int32),
        }
        for _ in range(6)
    ]
    cfg = ExperimentConfig(
        root_path=synth_root, model="unet", patch_size=(16, 16),
        batch_size=4, labeled_bs=2, max_iterations=6, val_interval=100,
        experiments_dir=str(tmp_path), exp="scan_ckpt", labeled_num=3,
        scan_steps=4, checkpoint_interval=3, keep_checkpoints=5,
    )
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    state = tr.fit(state, iter(raw))
    assert int(jax.device_get(state.step)) == 6
    steps = [_checkpoint_step_of(p)
             for p in list_step_checkpoints(cfg.snapshot_path)]
    assert steps == [3, 6], steps
