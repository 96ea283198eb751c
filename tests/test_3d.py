"""3D path: model shapes, sliding-window stitcher vs brute-force oracle,
BraTS transforms."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icl_tpu.data.brats import (
    BraTS2019Dataset,
    brats_train_batches,
    center_crop_3d,
    random_crop_3d,
)
from icl_tpu.data.synth import make_synthetic_brats
from icl_tpu.eval.infer3d import make_patch_predictor, sliding_window_predict
from icl_tpu.models.registry import net_factory


def test_unet3d_shapes():
    m = net_factory("unet_3D", 1, 2)
    x = jnp.zeros((1, 16, 16, 16, 1))
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               x, train=True)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 16, 16, 16, 2)
    # InstanceNorm is stateless: no batch_stats collection in the 3D UNet
    assert "batch_stats" not in v or not v.get("batch_stats")


@pytest.mark.slow
def test_unet3d_icl_contract():
    m = net_factory("unet_3D_icl", 1, 2, patch_size=16)
    x = jnp.zeros((1, 16, 16, 16, 1))
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               x, x, train=True)
    mutable = ["batch_stats"] if "batch_stats" in v else []
    outs, _ = m.apply(v, x, x, train=True, mutable=mutable,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    out_lab, out_unlab, fm_lab, fm_unlab, fm_consis = outs
    assert out_lab.shape == (1, 16, 16, 16, 2)
    # taps at P/16, P/8, P/4 = 1, 2, 4
    assert [f.shape for f in fm_lab] == [
        (1, 1, 1, 1, 2), (1, 2, 2, 2, 2), (1, 4, 4, 4, 2)
    ]
    inf = m.apply(v, x, train=False, inference=True)
    assert inf.shape == (1, 16, 16, 16, 2)


def test_crop_transforms():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(20, 24, 28)).astype(np.float32)
    lab = (img > 0.5).astype(np.uint8)
    ci, cl = random_crop_3d(img, lab, (8, 8, 8), rng)
    assert ci.shape == (8, 8, 8) and cl.shape == (8, 8, 8)
    ci, cl = center_crop_3d(img, lab, (8, 8, 8))
    assert ci.shape == (8, 8, 8)
    # pad path: crop bigger than volume
    ci, cl = random_crop_3d(img[:6, :6, :6], lab[:6, :6, :6], (8, 8, 8), rng)
    assert ci.shape == (8, 8, 8)


def test_brats_batches(tmp_path):
    root = make_synthetic_brats(str(tmp_path), num_cases=6, size=24)
    ds = BraTS2019Dataset(root, "train")
    gen = brats_train_batches(ds, labeled_count=2, total_count=len(ds),
                              batch_size=4, labeled_bs=2, patch_size=(16, 16, 16),
                              seed=0)
    b = next(gen)
    assert b["image"].shape == (4, 16, 16, 16, 1)
    assert b["label"].shape == (4, 16, 16, 16)


class _ToyNet:
    """Deterministic fake net: probs depend on voxel intensity, so the
    stitcher result is checkable against a brute-force oracle."""

    def apply(self, variables, x, train=False, inference=False):
        # logits: class1 ∝ x, class0 ∝ -x
        x = x[..., 0]
        return jnp.stack([-x, x], axis=-1)


def test_sliding_window_matches_bruteforce():
    rng = np.random.default_rng(0)
    image = rng.normal(size=(20, 18, 22)).astype(np.float32)
    patch = (8, 8, 8)
    probs_fn = make_patch_predictor(_ToyNet(), patch, sw_batch=3)
    got = sliding_window_predict(
        probs_fn, {}, image, num_classes=2, patch_size=patch,
        stride_xy=5, stride_z=4, sw_batch=3,
    )

    # Brute-force oracle with the documented reference semantics
    import math

    def starts(dim, p, s):
        n = math.ceil((dim - p) / s) + 1
        return [min(s * i, dim - p) for i in range(n)]

    def softmax(z, axis):
        e = np.exp(z - z.max(axis=axis, keepdims=True))
        return e / e.sum(axis=axis, keepdims=True)

    score = np.zeros((2,) + image.shape, np.float32)
    cnt = np.zeros(image.shape, np.float32)
    for xs in starts(20, 8, 5):
        for ys in starts(18, 8, 5):
            for zs in starts(22, 8, 4):
                p = image[xs:xs+8, ys:ys+8, zs:zs+8]
                logits = np.stack([-p, p], axis=0)
                sm = softmax(logits, axis=0)
                score[:, xs:xs+8, ys:ys+8, zs:zs+8] += sm
                cnt[xs:xs+8, ys:ys+8, zs:zs+8] += 1
    want = np.argmax(score / cnt, axis=0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow  # 27 s; 3D step coverage stays in the quick gate via
# test_unet3d_shapes + the 3D reference-parity forwards
def test_trainer_3d_step():
    """Trainer must handle 3D patch sizes end to end (regression: init
    unpacked (h, w))."""
    from icl_tpu.config import ExperimentConfig
    from icl_tpu.train.trainer import Trainer

    cfg = ExperimentConfig(model="unet_3D_icl", patch_size=(16, 16, 16),
                           batch_size=2, labeled_bs=1, num_classes=2,
                           max_iterations=10, consis_weight=10.0)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 2, size=(2, 16, 16, 16)), jnp.int32),
    }
    state, m = tr.step_jit(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert int(jax.device_get(state.step)) == 1


def test_sliding_window_pads_small_volume():
    image = np.zeros((5, 6, 7), np.float32)
    probs_fn = make_patch_predictor(_ToyNet(), (8, 8, 8), sw_batch=2)
    out = sliding_window_predict(probs_fn, {}, image, 2, (8, 8, 8), 4, 4, 2)
    assert out.shape == image.shape
