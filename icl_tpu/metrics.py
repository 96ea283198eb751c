"""Evaluation metrics: binary Dice + HD95 with reference sentinels.

The reference computes metrics with `medpy.metric.binary.dc/hd95`
(`code/val_2D.py:11-23`, `code/val_3D.py:85-97`). medpy is not available
here, so this module implements the identical math from first principles
with scipy (surface extraction by binary erosion, exact euclidean
distance transform), including the empty-mask sentinels:

    pred and gt both empty      -> (dice 1, hd95 0)
    exactly one of them empty   -> (dice 0, hd95 373.128664)

These run on host CPU (exact distance transforms are not XLA-friendly);
device code hands back uint8 masks.
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage


def dice_binary(pred: np.ndarray, gt: np.ndarray) -> float:
    """Dice coefficient 2|A∩B| / (|A|+|B|), as medpy.metric.binary.dc."""
    pred = np.asarray(pred).astype(bool)
    gt = np.asarray(gt).astype(bool)
    intersection = np.count_nonzero(pred & gt)
    size_sum = np.count_nonzero(pred) + np.count_nonzero(gt)
    if size_sum == 0:
        return 0.0
    return 2.0 * intersection / float(size_sum)


def _surface_distances(
    result: np.ndarray,
    reference: np.ndarray,
    voxelspacing=None,
    connectivity: int = 1,
) -> np.ndarray:
    """Distances from border voxels of `result` to the border of
    `reference` (medpy __surface_distances semantics)."""
    result = np.atleast_1d(np.asarray(result).astype(bool))
    reference = np.atleast_1d(np.asarray(reference).astype(bool))
    footprint = ndimage.generate_binary_structure(result.ndim, connectivity)
    if not np.any(result):
        raise RuntimeError("result is empty; surface distance undefined")
    if not np.any(reference):
        raise RuntimeError("reference is empty; surface distance undefined")
    result_border = result ^ ndimage.binary_erosion(result, structure=footprint, iterations=1)
    reference_border = reference ^ ndimage.binary_erosion(
        reference, structure=footprint, iterations=1
    )
    dt = ndimage.distance_transform_edt(~reference_border, sampling=voxelspacing)
    return dt[result_border]


def hd95_binary(pred: np.ndarray, gt: np.ndarray, voxelspacing=None) -> float:
    """95th-percentile symmetric Hausdorff distance, as medpy hd95."""
    hd1 = _surface_distances(pred, gt, voxelspacing)
    hd2 = _surface_distances(gt, pred, voxelspacing)
    return float(np.percentile(np.hstack((hd1, hd2)), 95))


# Sentinel HD95 used by the reference when exactly one mask is empty
# (val_2D.py:18-21).
EMPTY_SENTINEL_HD95 = 373.128664


def calculate_metric_percase(pred: np.ndarray, gt: np.ndarray) -> tuple[float, float]:
    """(dice, hd95) for one binary class, with reference sentinels
    (val_2D.py:11-23)."""
    pred = np.asarray(pred) > 0
    gt = np.asarray(gt) > 0
    pred_any = bool(pred.any())
    gt_any = bool(gt.any())
    if pred_any and gt_any:
        return dice_binary(pred, gt), hd95_binary(pred, gt)
    if pred_any != gt_any:
        return 0.0, EMPTY_SENTINEL_HD95
    return 1.0, 0.0


def pixel_accuracy(pred: np.ndarray, gt: np.ndarray) -> float:
    """Overall pixel accuracy over labeled (gt>=0) pixels
    (utils/metrics.py SegmentationMetric pixAcc semantics)."""
    labeled = gt >= 0
    correct = np.count_nonzero((pred == gt) & labeled)
    return correct / max(1, np.count_nonzero(labeled))


def mean_iou(pred: np.ndarray, gt: np.ndarray, num_classes: int) -> float:
    """Mean intersection-over-union over classes present in gt∪pred
    (utils/metrics.py mIoU semantics)."""
    ious = []
    for c in range(num_classes):
        p = pred == c
        g = gt == c
        union = np.count_nonzero(p | g)
        if union == 0:
            continue
        ious.append(np.count_nonzero(p & g) / union)
    return float(np.mean(ious)) if ious else 0.0


def jaccard_binary(pred: np.ndarray, gt: np.ndarray) -> float:
    """Binary Jaccard index (medpy.metric.binary.jc, used by
    calculate_metric_dice_percase val_2D.py:25-33)."""
    pred = np.asarray(pred).astype(bool)
    gt = np.asarray(gt).astype(bool)
    union = np.count_nonzero(pred | gt)
    if union == 0:
        return 0.0
    return np.count_nonzero(pred & gt) / union


def evaluate_seg(pred: np.ndarray, gt: np.ndarray) -> tuple[float, float, float]:
    """(MAE, Dice, IoU) for soft binary maps, thresholded at 0.5 — the
    reference's `evaluate_seg` helper (val_2D.py:57-86; dead code there,
    ported for §2 completeness). Keeps the reference's TP-floor quirk:
    TP == 0 is replaced by 1 before the ratios, so an all-negative
    prediction on a positive gt still yields nonzero Dice/IoU."""
    pred_b = (np.asarray(pred, np.float64) >= 0.5).astype(np.float64)
    gt_b = (np.asarray(gt, np.float64) >= 0.5).astype(np.float64)
    mae = float(np.abs(pred_b - gt_b).mean())
    tp = float((pred_b * gt_b).sum())
    fp = float((pred_b * (1.0 - gt_b)).sum())
    fn = float(((1.0 - pred_b) * gt_b).sum())
    if tp == 0.0:
        tp = 1.0
    recall = tp / (tp + fn)
    precision = tp / (tp + fp)
    dice = 2.0 * precision * recall / (precision + recall)
    iou = tp / (tp + fp + fn)
    return mae, dice, iou


def aggregate_case_metrics(metric_cal: list[list[tuple[float, float]]]):
    """Aggregate per-case (dice, hd95) lists per class the reference way
    (train_inherent_consistent_unet_2D.py:158-170): per-class mean/std
    over cases, then mean over classes.

    metric_cal: list over classes of lists over cases of (dice, hd95).
    Returns dict with mean_dice, mean_hd95, std_dice, std_hd95,
    class_mean, class_std (each class entry is an array [dice, hd95]).
    """
    num_fg = len(metric_cal)
    mean_cal = 0.0
    std_cal = 0.0
    class_mean, class_std = [], []
    for per_case in metric_cal:
        arr = np.asarray(per_case, dtype=np.float64)
        _mean = arr.mean(axis=0)
        _std = arr.std(axis=0)
        mean_cal = mean_cal + _mean
        std_cal = std_cal + _std
        class_mean.append(_mean)
        class_std.append(_std)
    return {
        "mean_dice": float(mean_cal[0] / num_fg),
        "mean_hd95": float(mean_cal[1] / num_fg),
        "std_dice": float(std_cal[0] / num_fg),
        "std_hd95": float(std_cal[1] / num_fg),
        "class_mean": class_mean,
        "class_std": class_std,
    }
