"""Dice/HD95 metric math + reference sentinels (val_2D.py:11-23)."""
import numpy as np

from icl_tpu import metrics


def test_dice_simple():
    a = np.zeros((8, 8), bool)
    b = np.zeros((8, 8), bool)
    a[2:6, 2:6] = True
    b[3:7, 3:7] = True
    # |A∩B| = 9, |A|=|B|=16
    assert abs(metrics.dice_binary(a, b) - 2 * 9 / 32) < 1e-12


def test_sentinels():
    empty = np.zeros((8, 8), bool)
    full = np.zeros((8, 8), bool)
    full[2:4, 2:4] = True
    assert metrics.calculate_metric_percase(empty, empty) == (1.0, 0.0)
    assert metrics.calculate_metric_percase(full, empty) == (0.0, 373.128664)
    assert metrics.calculate_metric_percase(empty, full) == (0.0, 373.128664)


def test_hd95_identical_masks():
    m = np.zeros((16, 16), bool)
    m[4:10, 4:10] = True
    dice, hd = metrics.calculate_metric_percase(m, m)
    assert dice == 1.0 and hd == 0.0


def test_hd95_shifted_box():
    """Two 1-pixel-thick vertical lines 5 apart: every surface point of
    one is exactly 5 from the other, so hd95 = 5."""
    a = np.zeros((32, 32), bool)
    b = np.zeros((32, 32), bool)
    a[8:24, 10] = True
    b[8:24, 15] = True
    hd = metrics.hd95_binary(a, b)
    assert abs(hd - 5.0) < 1e-9


def test_aggregate():
    per_class = [
        [(1.0, 0.0), (0.5, 10.0)],  # class 1: two cases
        [(0.8, 2.0), (0.6, 4.0)],   # class 2
    ]
    agg = metrics.aggregate_case_metrics(per_class)
    assert abs(agg["mean_dice"] - ((0.75 + 0.7) / 2)) < 1e-12
    assert abs(agg["mean_hd95"] - ((5.0 + 3.0) / 2)) < 1e-12


def test_evaluate_seg_reference_formula():
    """Ported evaluate_seg (val_2D.py:57-86, dead in the reference):
    MAE / F1-Dice / IoU on thresholded soft maps, including the TP-floor
    quirk (TP==0 -> 1)."""
    from icl_tpu.metrics import evaluate_seg

    pred = np.zeros((8, 8), np.float32)
    gt = np.zeros((8, 8), np.float32)
    pred[:4, :4] = 0.9   # 16 positive
    gt[:4, :6] = 1.0     # 24 positive, overlap 16
    mae, dice, iou = evaluate_seg(pred, gt)
    tp, fp, fn = 16.0, 0.0, 8.0
    prec, rec = tp / (tp + fp), tp / (tp + fn)
    assert abs(mae - 8.0 / 64.0) < 1e-12
    assert abs(dice - 2 * prec * rec / (prec + rec)) < 1e-12
    assert abs(iou - tp / (tp + fp + fn)) < 1e-12

    # TP == 0 floor: reference substitutes TP=1 before the ratios
    pred0 = np.zeros((4, 4), np.float32)
    gt1 = np.ones((4, 4), np.float32)
    mae, dice, iou = evaluate_seg(pred0, gt1)
    assert abs(mae - 1.0) < 1e-12
    assert abs(dice - 2 * (1 / 1) * (1 / 17) / (1 / 1 + 1 / 17)) < 1e-12
    assert abs(iou - 1.0 / 17.0) < 1e-12
