"""Regression tests for round-1 latent API traps (VERDICT r1 item 9):
metric argument order in evaluate_*_cases and recursive checkpoint
merging in load_eval_variables."""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def test_evaluate_cases_pass_pred_then_gt(monkeypatch, tmp_path):
    """evaluate_brats_cases must call calculate_metric_percase(pred, gt)
    — the reference order (val_2D.py:51-53). Detected by making the net
    predict all-class-1 while gt is all-class-0."""
    from icl_tpu.eval import infer3d

    calls = []

    def recorder(pred, gt):
        calls.append((np.asarray(pred).copy(), np.asarray(gt).copy()))
        return (1.0, 0.0)

    monkeypatch.setattr(infer3d, "calculate_metric_percase", recorder)

    def probs_fn(variables, patches):
        # [N, *roi, C] probabilities: always class 1
        n = patches.shape[0]
        out = np.zeros((n, 8, 8, 8, 2), np.float32)
        out[..., 1] = 1.0
        return jnp.asarray(out)

    dataset = [{
        "image": np.zeros((8, 8, 8), np.float32),
        "label": np.zeros((8, 8, 8), np.int32),  # gt: all background
    }]
    infer3d.evaluate_brats_cases(
        probs_fn, {}, dataset, num_classes=2, patch_size=(8, 8, 8),
        stride_xy=8, stride_z=8,
    )
    (pred, gt), = calls
    assert pred.all(), "first argument must be the prediction mask"
    assert not gt.any(), "second argument must be the ground-truth mask"


def test_load_eval_variables_merges_recursively(tmp_path):
    """A checkpoint holding only a PARTIAL subtree (e.g. just
    encoder.in_conv) must keep the fresh-init siblings inside merged
    nodes instead of silently dropping them (checkpoint.py round-1 used
    dict.update at the top level only)."""
    import jax

    from icl_tpu.models.unet2d import UNet
    from icl_tpu.utils import checkpoint as ckpt

    model = UNet(in_chns=1, class_num=2)
    x = jnp.zeros((1, 16, 16, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )

    marker = jax.tree.map(
        lambda v: np.full(v.shape, 7.0, v.dtype),
        jax.device_get(variables["params"]["encoder"]["in_conv"]),
    )
    path = str(tmp_path / "partial.msgpack")
    ckpt.save_pytree(path, {"params": {"encoder": {"in_conv": marker}}})

    merged = ckpt.load_eval_variables(model, path, x)
    enc = merged["params"]["encoder"]
    # overlaid leaf applied...
    assert float(np.ravel(enc["in_conv"]["conv1"]["Conv_0"]["kernel"])[0]) == 7.0
    # ...and the sibling blocks inside 'encoder' survived the merge
    assert "down1" in enc and "down4" in enc
    assert merged["params"]["decoder"]["out_conv"]["Conv_0"]["kernel"].shape[-1] == 2
    # batch_stats for non-overlaid nodes still present
    assert "in_conv" in merged["batch_stats"]["encoder"]


def test_merge_trees_nested_semantics():
    from icl_tpu.utils.checkpoint import merge_trees

    base = {"a": {"x": 1, "y": 2}, "b": 3}
    overlay = {"a": {"y": 20}}
    out = merge_trees(base, overlay)
    assert out == {"a": {"x": 1, "y": 20}, "b": 3}
    assert base == {"a": {"x": 1, "y": 2}, "b": 3}  # no mutation


def test_config_rejects_labeled_bs_above_batch_size():
    """Round-4 verify finding: --batch_size 4 with the default
    labeled_bs=8 produced a negative unlabeled sub-batch that surfaced
    as `broadcast_in_dim shape (-4, 64, 64, 1)` deep inside the jitted
    step. The config must fail loud instead."""
    import pytest

    from icl_tpu.config import ExperimentConfig

    with pytest.raises(ValueError, match="labeled_bs"):
        ExperimentConfig(batch_size=4, labeled_bs=8)
    with pytest.raises(ValueError, match="labeled_bs"):
        ExperimentConfig(batch_size=4, labeled_bs=0)
    with pytest.raises(ValueError, match="scan_steps"):
        ExperimentConfig(scan_steps=0)
    # boundary: fully-supervised configs use labeled_bs == batch_size
    ExperimentConfig(batch_size=4, labeled_bs=4)


def test_config_default_labeled_bs_resolves_with_small_batch():
    """ADVICE r4 (high): the fully-supervised 3D scripts default
    --batch_size 4 and never pass labeled_bs; their default invocation
    must construct (labeled_bs resolves to min(8, batch_size)), not
    raise — only an EXPLICIT labeled_bs > batch_size fails loud."""
    from icl_tpu.config import ExperimentConfig

    assert ExperimentConfig(batch_size=4).labeled_bs == 4
    assert ExperimentConfig(batch_size=16).labeled_bs == 8
    assert ExperimentConfig().labeled_bs == 8
