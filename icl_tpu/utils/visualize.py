"""TensorBoard image visualization (reference `code/utils/visualize.py`:
multi-scale GT / aux / pseudo / prediction dumps — not called by the
reference entry scripts but part of its toolkit).

Writes normalized grayscale images and color-mapped label maps.
"""
from __future__ import annotations

import numpy as np

# simple categorical palette for up to 16 classes (RGB, 0-255)
_PALETTE = np.array(
    [
        [0, 0, 0], [228, 26, 28], [55, 126, 184], [77, 175, 74],
        [152, 78, 163], [255, 127, 0], [255, 255, 51], [166, 86, 40],
        [247, 129, 191], [153, 153, 153], [102, 194, 165], [252, 141, 98],
        [141, 160, 203], [231, 138, 195], [166, 216, 84], [255, 217, 47],
    ],
    np.uint8,
)


def normalize_image(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, np.float32)
    lo, hi = img.min(), img.max()
    return (img - lo) / max(hi - lo, 1e-8)


def label_to_rgb(label: np.ndarray) -> np.ndarray:
    return _PALETTE[np.asarray(label).astype(np.int64) % len(_PALETTE)]


def write_prediction_panel(writer, tag: str, image: np.ndarray, label: np.ndarray,
                           prediction: np.ndarray, step: int,
                           feat_maps=None) -> None:
    """Write image / GT / prediction (and optional multi-scale class maps,
    argmaxed) to a ScalarWriter's tensorboard (if available)."""
    tb = getattr(writer, "_tb", None)
    if tb is None:
        return
    img = (normalize_image(image) * 255).astype(np.uint8)
    tb.add_image(f"{tag}/image", img[None], step, dataformats="CHW")
    tb.add_image(f"{tag}/gt", label_to_rgb(label), step, dataformats="HWC")
    tb.add_image(f"{tag}/pred", label_to_rgb(prediction), step, dataformats="HWC")
    if feat_maps is not None:
        for i, fm in enumerate(feat_maps):
            cls_map = np.argmax(np.asarray(fm), axis=-1)
            tb.add_image(f"{tag}/aux_scale{i}", label_to_rgb(cls_map[0]), step,
                         dataformats="HWC")
