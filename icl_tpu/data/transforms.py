"""Host-side 2D augmentations matching the reference ACDC pipeline.

Reproduces `code/dataloaders/dataset.py:75-166`:
  * random_rot_flip: rot90 by k∈{0..3} then flip along a random axis.
  * random_rotate: ±20° order-0 rotation, reshape=False.
  * RandomGenerator: 50% rot_flip, else 25% rotate; then order-0 zoom to
    the patch size.

The reference draws randomness from python `random` + global `np.random`
inside unseeded DataLoader workers; here every transform takes an
explicit numpy Generator (run-level reproducibility by design).

Outputs are channel-LAST float32 images [H, W, 1] and uint8 labels
[H, W] — the TPU-native layout.
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage
from scipy.ndimage import zoom

from icl_tpu import native


def random_rot_flip(image: np.ndarray, label: np.ndarray, rng: np.random.Generator):
    k = int(rng.integers(0, 4))
    axis = int(rng.integers(0, 2))
    image = np.flip(np.rot90(image, k), axis=axis).copy()
    label = np.flip(np.rot90(label, k), axis=axis).copy()
    return image, label


def random_rotate(image: np.ndarray, label: np.ndarray, rng: np.random.Generator):
    angle = int(rng.integers(-20, 20))
    if native.available():
        return (native.rotate_nearest(image.astype(np.float32), angle),
                native.rotate_nearest(label, angle))
    image = ndimage.rotate(image, angle, order=0, reshape=False)
    label = ndimage.rotate(label, angle, order=0, reshape=False)
    return image, label


def zoom_to(image: np.ndarray, output_size, order: int = 0) -> np.ndarray:
    """scipy order-0 zoom to `output_size` (dataset.py:161-162); routed
    through the native C++ kernel when built (exact-match semantics)."""
    if order == 0 and native.available() and image.ndim == 2:
        if image.dtype == np.float32 or image.dtype == np.uint8:
            return native.zoom_nearest(image, output_size)
    x, y = image.shape
    return zoom(image, (output_size[0] / x, output_size[1] / y), order=order)


def color_jitter(image: np.ndarray, rng: np.random.Generator, s: float = 1.0):
    """Grayscale-effective equivalent of torchvision
    ColorJitter(0.8s, 0.8s, 0.8s, 0.2s) (dataset.py:95-103): random
    brightness/contrast factors in [max(0, 1−0.8s), 1+0.8s]; saturation/
    hue are no-ops on single-channel data."""
    lo = max(0.0, 1.0 - 0.8 * s)
    hi = 1.0 + 0.8 * s
    b = rng.uniform(lo, hi)
    c = rng.uniform(lo, hi)
    out = image * b
    mean = out.mean()
    out = (out - mean) * c + mean
    return np.clip(out, 0.0, 1.0).astype(np.float32)


class WeakStrongAugment:
    """FixMatch-style weak (rot/flip) + strong (color jitter) pair
    (dataset.py:169-202); all images resized to output_size first."""

    def __init__(self, output_size):
        self.output_size = tuple(output_size)

    def __call__(self, image, label, rng: np.random.Generator):
        image = zoom_to(image, self.output_size, order=0)
        label = zoom_to(label, self.output_size, order=0)
        image_weak, label = random_rot_flip(image, label, rng)
        image_strong = color_jitter(image_weak, rng)
        return {
            "image": image.astype(np.float32)[..., None],
            "image_weak": image_weak.astype(np.float32)[..., None],
            "image_strong": image_strong.astype(np.float32)[..., None],
            "label_aug": label.astype(np.uint8),
        }


class CTATransform:
    """CTAugment-policy weak/strong transform (dataset.py:106-144):
    resize, then apply learned weak ops to image+label and strong ops on
    top of the weak image."""

    def __init__(self, output_size, cta):
        self.output_size = tuple(output_size)
        self.cta = cta

    def __call__(self, image, label, ops_weak, ops_strong):
        from icl_tpu.data.ctaugment import cta_apply

        image = zoom_to(image, self.output_size, order=0)
        label = zoom_to(label, self.output_size, order=0)
        image_weak = cta_apply(image.astype(np.float32), ops_weak)
        image_strong = cta_apply(image_weak, ops_strong)
        label_aug = cta_apply(label.astype(np.float32) / 255.0, ops_weak)
        label_aug = np.round(255 * label_aug).astype(np.int32)
        return {
            "image_weak": image_weak[..., None],
            "image_strong": image_strong[..., None],
            "label_aug": label_aug,
        }


class RandomGenerator:
    """The reference's RandomGenerator transform (dataset.py:147-166)."""

    def __init__(self, output_size):
        self.output_size = tuple(output_size)

    def __call__(self, image: np.ndarray, label: np.ndarray, rng: np.random.Generator):
        # Reference branch structure: `if random() > 0.5: rot_flip
        # elif random() > 0.5: rotate` — i.e. 50% rot_flip, 25% rotate,
        # 25% untouched (dataset.py:156-159).
        u1 = rng.random()
        if u1 > 0.5:
            image, label = random_rot_flip(image, label, rng)
        elif rng.random() > 0.5:
            image, label = random_rotate(image, label, rng)
        image = zoom_to(image, self.output_size, order=0)
        label = zoom_to(label, self.output_size, order=0)
        image = image.astype(np.float32)[..., None]  # [H, W, 1]
        label = label.astype(np.uint8)
        return image, label
