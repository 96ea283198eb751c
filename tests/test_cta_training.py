"""CTAugment end-to-end (VERDICT r1 item 8): cta_batches supplies
policy-augmented weak/strong pairs + a probe; CTATrainer runs the
FixMatch step and updates op rates from probe proximity — done = a short
train run with CTA active and rates moving."""
import numpy as np
import pytest

import jax

from icl_tpu.config import ExperimentConfig
from icl_tpu.data.acdc import ACDCDataset
from icl_tpu.data.ctaugment import CTAugment, OPS
from icl_tpu.data.pipeline import cta_batches
from icl_tpu.data.synth import make_synthetic_acdc
from icl_tpu.train.cta import CTATrainer


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ACDC_cta")
    return make_synthetic_acdc(str(root), num_slices=12, num_volumes=2, slice_size=16)


def _flat_rates(cta):
    return np.concatenate(
        [np.concatenate(list(map(np.asarray, cta.rates[k])))
         for k in sorted(OPS) if len(cta.rates[k])]
    )


def test_cta_batches_shapes(synth_root):
    cta = CTAugment(seed=0)
    ds = ACDCDataset(synth_root, "train")
    it = cta_batches(ds, labeled_count=6, batch_size=4, labeled_bs=2,
                     patch_size=(16, 16), cta=cta, seed=0)
    b = next(it)
    assert b["image_weak"].shape == (4, 16, 16, 1)
    assert b["image_strong"].shape == (4, 16, 16, 1)
    assert b["label_aug"].shape == (4, 16, 16)
    assert b["probe_image"].shape == (1, 16, 16, 1)
    assert b["probe_label"].shape == (1, 16, 16)
    assert isinstance(b["probe_policy"], list) and len(b["probe_policy"]) == 2
    # labels survive the PIL round-trip as class ids
    assert set(np.unique(b["label_aug"])) <= set(range(4))


@pytest.mark.parametrize("rate_lag", [0, 1])
def test_cta_training_moves_rates(synth_root, tmp_path, rate_lag):
    cfg = ExperimentConfig(
        root_path=synth_root, model="unet", patch_size=(16, 16), batch_size=4,
        labeled_bs=2, max_iterations=10, base_lr=0.01,
        experiments_dir=str(tmp_path), exp="cta_smoke", labeled_num=3,
    )
    cta = CTAugment(seed=1)
    before = _flat_rates(cta).copy()

    tr = CTATrainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    ds = ACDCDataset(synth_root, "train")
    batches = cta_batches(ds, labeled_count=6, batch_size=4, labeled_bs=2,
                          patch_size=(16, 16), cta=cta, seed=0)
    state = tr.fit(state, batches, cta, max_steps=10, rate_lag=rate_lag)

    assert int(jax.device_get(state.step)) == 10
    after = _flat_rates(cta)
    moved = np.sum(np.abs(after - before) > 1e-6)
    assert moved >= 10, f"only {moved} rate bins moved after 10 probes"
    # stats() renders without error (the reference's printed diagnostics)
    assert isinstance(cta.stats(), str)


def test_fused_probe_matches_separate(synth_root, tmp_path):
    """The probe proximity computed INSIDE the fused train step
    (steps.make_fixmatch_cta_step fused_probe=True — fit()'s one-dispatch
    path) equals CTATrainer.probe_proximity run separately against the
    post-step state: same post-update params, same FixMatch formula."""
    import jax.numpy as jnp

    cfg = ExperimentConfig(
        root_path=synth_root, model="unet", patch_size=(16, 16), batch_size=4,
        labeled_bs=2, max_iterations=10, base_lr=0.01,
        experiments_dir=str(tmp_path), exp="cta_fused", labeled_num=3,
    )
    tr = CTATrainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    cta = CTAugment(seed=2)
    ds = ACDCDataset(synth_root, "train")
    b = next(cta_batches(ds, labeled_count=6, batch_size=4, labeled_bs=2,
                         patch_size=(16, 16), cta=cta, seed=0))
    probe_image, probe_label = b["probe_image"], b["probe_label"]
    device_batch = {
        "image_weak": jnp.asarray(b["image_weak"]),
        "image_strong": jnp.asarray(b["image_strong"]),
        "label_aug": jnp.asarray(b["label_aug"], jnp.int32),
        "probe_image": jnp.asarray(probe_image),
        "probe_label": jnp.asarray(probe_label, jnp.int32),
    }
    rng = jax.random.PRNGKey(cfg.seed)
    new_state, metrics = tr.step_auto_probe(state, device_batch, rng)
    fused = float(np.asarray(metrics["probe_proximity"]))
    separate = tr.probe_proximity(new_state, probe_image, probe_label)
    assert abs(fused - separate) < 1e-5
    assert 0.0 <= fused <= 1.0


def test_cta_state_roundtrip(tmp_path):
    """StorableCTAugment parity (augmentations/__init__.py:7-17): the
    learned rates survive state_dict/load_state_dict AND a JSON file
    round-trip, so a resumed CTA run keeps its policy."""
    cta = CTAugment(seed=3)
    # perturb some rates as training would
    for _ in range(5):
        policy = cta.policy(probe=True, weak=False)
        cta.update_rates(policy, proximity=0.25)
    sd = cta.state_dict()
    assert list(sd.keys()) == ["decay", "depth", "th", "rates"]

    fresh = CTAugment(seed=0)
    fresh.load_state_dict(sd)
    np.testing.assert_array_equal(_flat_rates(fresh), _flat_rates(cta))

    path = str(tmp_path / "model" / "cta_state.json")
    cta.save(path)
    restored = CTAugment(seed=0)
    restored.restore(path)
    assert restored.decay == cta.decay and restored.th == cta.th
    assert restored.depth == cta.depth
    np.testing.assert_allclose(_flat_rates(restored), _flat_rates(cta),
                               atol=1e-7)
    # restored learner keeps learning (types intact after JSON round-trip)
    pol = restored.policy(probe=True, weak=True)
    restored.update_rates(pol, proximity=0.5)


def test_probe_proximity_class_sum(synth_root, tmp_path):
    """FixMatch weight formula: proximity = 1 - 0.5*mean_pixels
    sum_classes |p - y| — invariant to num_classes padding (ADVICE r2:
    a class-MEAN would shrink the error term by num_classes)."""
    import jax.numpy as jnp

    cfg = ExperimentConfig(
        root_path=synth_root, model="unet", patch_size=(16, 16), batch_size=4,
        labeled_bs=2, max_iterations=10, base_lr=0.01,
        experiments_dir=str(tmp_path), exp="cta_prox", labeled_num=3,
    )
    tr = CTATrainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    img = np.random.default_rng(0).normal(size=(1, 16, 16, 1)).astype(np.float32)
    lab = np.zeros((1, 16, 16), np.int32)
    prox = tr.probe_proximity(state, img, lab)
    # independent recomputation with the class-axis SUM
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    probs = np.asarray(tr._probe_probs(variables, jnp.asarray(img)))
    onehot = np.eye(probs.shape[-1], dtype=np.float64)[lab]
    want = 1.0 - 0.5 * np.abs(probs - onehot).sum(-1).mean()
    assert abs(prox - want) < 1e-5
    assert 0.0 <= prox <= 1.0
