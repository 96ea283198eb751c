"""Ramp-up schedules (reference `code/utils/ramps.py`).

Note: the reference computes `consistency_weight` via sigmoid_rampup in
the AMOS script but never applies it to the loss
(train_inherent_consistent_unet_3D_AMOS22.py:224,230); fixed weights are
the actual behavior. The ramps are provided for API completeness.
"""
from __future__ import annotations

import numpy as np


def sigmoid_rampup(current: float, rampup_length: float) -> float:
    """Exponential rampup exp(-5(1-t)^2) (ramps.py:19-26)."""
    if rampup_length == 0:
        return 1.0
    current = float(np.clip(current, 0.0, rampup_length))
    phase = 1.0 - current / rampup_length
    return float(np.exp(-5.0 * phase * phase))


def linear_rampup(current: float, rampup_length: float) -> float:
    """Linear rampup (ramps.py:29-35)."""
    if rampup_length == 0:
        return 1.0
    return float(np.clip(current, 0.0, rampup_length) / rampup_length)


def cosine_rampdown(current: float, rampdown_length: float) -> float:
    """Cosine rampdown from https://arxiv.org/abs/1608.03983 (ramps.py:38-41)."""
    assert 0 <= current <= rampdown_length
    return float(0.5 * (np.cos(np.pi * current / rampdown_length) + 1))
