"""AMOS22 pipeline: Decathlon JSON datalist + MONAI-equivalent transforms.

Reimplements the 6 deterministic + 5 random MONAI transforms the
reference composes (train_inherent_consistent_unet_3D_AMOS22.py:84-159)
without MONAI:

  deterministic (cached once, CacheDataset-style):
    LoadImaged → ScaleIntensityRanged(-175, 250 → 0, 1, clip) →
    CropForegroundd(source='image') → Orientationd(RAS) →
    Spacingd((1.5, 1.5, 2.0), bilinear/nearest)
  random (per access):
    RandSpatialCropd(96³) → SpatialPadd(96³) → RandFlipd ×3 (p=.1) →
    RandRotate90d(p=.1, max_k=3) → RandShiftIntensityd(.1, p=.5)

Spacingd resampling uses the MONAI-bitwise grid_sample-equivalent
kernel (data.resample, oracle-verified vs torch F.grid_sample with
border padding / align_corners=False) — voxel-identical with the
reference's MONAI 1.0.1 resampler.

AMOS organ tags: SPL RKI LKI GBL ESO LIV STO AOR IVC PAN RAG LAG DUO
BLA PRO/UTE (AMOS22 script :159).
"""
from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
from scipy.ndimage import zoom as nd_zoom

from icl_tpu.data.nifti import load_nifti, to_ras, voxel_spacing
from icl_tpu.data.sampler import two_stream_batches

AMOS_CLASS_NAMES = [
    "SPL", "RKI", "LKI", "GBL", "ESO", "LIV", "STO", "AOR", "IVC", "PAN",
    "RAG", "LAG", "DUO", "BLA", "PRO/UTE",
]


def load_decathlon_datalist(json_path: str, section: str = "training") -> list[dict]:
    """MONAI load_decathlon_datalist equivalent: resolve relative paths
    against the JSON's directory. When `json_path` doesn't exist, fall
    back to the repo-vendored official split
    (data/AMOS22/dataset_semi_ct.json) — still resolving relative image
    paths against the *requested* location, i.e. the user's data dir."""
    base = os.path.dirname(os.path.abspath(json_path))
    if not os.path.exists(json_path):
        from icl_tpu.data.manifests import vendored_path

        vendored = vendored_path("AMOS22", os.path.basename(json_path))
        if os.path.exists(vendored):
            json_path = vendored
    with open(json_path) as f:
        spec = json.load(f)
    items = []
    for entry in spec[section]:
        if isinstance(entry, str):
            entry = {"image": entry}
        item = {}
        for k, v in entry.items():
            item[k] = os.path.join(base, v) if isinstance(v, str) else v
        items.append(item)
    return items


def scale_intensity_range(img, a_min=-175.0, a_max=250.0, b_min=0.0, b_max=1.0):
    img = (img.astype(np.float32) - a_min) / (a_max - a_min)
    img = img * (b_max - b_min) + b_min
    return np.clip(img, b_min, b_max)


def crop_foreground(image, label, select=lambda x: x > 0, margin: int = 0):
    """Bounding box of select(image) applied to both (MONAI
    CropForegroundd defaults)."""
    mask = select(image)
    if not mask.any():
        return image, label
    sl = []
    for ax in range(3):
        other = tuple(i for i in range(3) if i != ax)
        prof = mask.any(axis=other)
        idx = np.where(prof)[0]
        lo = max(0, idx[0] - margin)
        hi = min(image.shape[ax], idx[-1] + 1 + margin)
        sl.append(slice(lo, hi))
    sl = tuple(sl)
    return image[sl], label[sl]


def resample_spacing(image, label, affine, new_spacing=(1.5, 1.5, 2.0),
                     exact: bool = True):
    """Spacingd resampling. exact=True (default) is the MONAI-bitwise
    grid_sample-equivalent kernel (data.resample, verified against a
    torch oracle — VERDICT r1 item 4); exact=False keeps the round-1
    scipy zoom path (order-1/0) for comparison."""
    if exact:
        from icl_tpu.data.resample import monai_spacing_resample

        image, _ = monai_spacing_resample(image, affine, new_spacing,
                                          mode="bilinear")
        label, _ = monai_spacing_resample(label, affine, new_spacing,
                                          mode="nearest")
        return image, label
    old = voxel_spacing(affine)
    factors = old / np.asarray(new_spacing, np.float64)
    image = nd_zoom(image.astype(np.float32), factors, order=1)
    label = nd_zoom(label, factors, order=0)
    return image, label


def spatial_pad(image, label, size=(96, 96, 96)):
    """Centered symmetric pad to at least `size` (MONAI SpatialPadd)."""
    pads = []
    for ax in range(3):
        need = max(size[ax] - image.shape[ax], 0)
        pads.append((need // 2, need - need // 2))
    if any(p != (0, 0) for p in pads):
        image = np.pad(image, pads, mode="constant")
        label = np.pad(label, pads, mode="constant")
    return image, label


def rand_spatial_crop(image, label, size, rng: np.random.Generator):
    starts = []
    for ax in range(3):
        span = image.shape[ax] - size[ax]
        starts.append(int(rng.integers(0, span + 1)) if span > 0 else 0)
    sl = tuple(slice(s, s + size[ax]) for ax, s in enumerate(starts))
    return image[sl], label[sl]


class AMOSDataset:
    """CacheDataset-equivalent: deterministic preprocessing computed once
    per case and cached in RAM; the random augmentations run per access
    via `augment` (AMOS22 script :180-186)."""

    def __init__(self, datalist: list[dict], cache: bool = True,
                 spacing=(1.5, 1.5, 2.0), val_mode: bool = False):
        self.datalist = datalist
        self.spacing = spacing
        self.val_mode = val_mode
        self._cache: dict[int, tuple] = {} if cache else None

    def __len__(self):
        return len(self.datalist)

    def _load(self, idx: int):
        item = self.datalist[idx]
        img_vol = load_nifti(item["image"])
        lab_vol = load_nifti(item["label"])
        image, affine = to_ras(img_vol.data, img_vol.affine)
        label, _ = to_ras(lab_vol.data, lab_vol.affine)
        image = scale_intensity_range(image)
        image, label = crop_foreground(image, label)
        if self.val_mode:
            # val order: pad to 96³ BEFORE spacing (AMOS22 script :139-158)
            image, label = spatial_pad(image, label)
        image, label = resample_spacing(image, label, affine, self.spacing)
        return image.astype(np.float32), label.astype(np.uint8)

    def preprocessed(self, idx: int):
        if self._cache is not None:
            if idx not in self._cache:
                self._cache[idx] = self._load(idx)
            return self._cache[idx]
        return self._load(idx)

    def augment(self, idx: int, rng: np.random.Generator, roi=(96, 96, 96)):
        image, label = self.preprocessed(idx)
        image, label = rand_spatial_crop(image, label, roi, rng)
        image, label = spatial_pad(image, label, roi)
        for ax in range(3):
            if rng.random() < 0.10:
                image = np.flip(image, axis=ax)
                label = np.flip(label, axis=ax)
        if rng.random() < 0.10:
            k = int(rng.integers(1, 4))
            image = np.rot90(image, k, axes=(0, 1))
            label = np.rot90(label, k, axes=(0, 1))
        if rng.random() < 0.50:
            image = image + rng.uniform(-0.10, 0.10)
        return np.ascontiguousarray(image), np.ascontiguousarray(label)

    def __getitem__(self, idx: int) -> dict:
        image, label = self.preprocessed(idx)
        return {"image": image, "label": label, "idx": idx}


def amos_train_batches(
    dataset: AMOSDataset,
    labeled_count: int,
    total_count: int,
    batch_size: int,
    labeled_bs: int,
    roi=(96, 96, 96),
    seed: int = 1337,
) -> Iterator[dict]:
    labeled_idxs = list(range(0, labeled_count))
    unlabeled_idxs = list(range(labeled_count, total_count))
    aug_rng = np.random.default_rng(seed + 1)
    for idxs in two_stream_batches(
        labeled_idxs, unlabeled_idxs, batch_size, batch_size - labeled_bs, seed=seed
    ):
        imgs, labs = [], []
        for i in idxs:
            img, lab = dataset.augment(i, aug_rng, roi)
            imgs.append(img.astype(np.float32)[..., None])
            labs.append(lab.astype(np.uint8))
        yield {"image": np.stack(imgs), "label": np.stack(labs)}


def amos_supervised_batches(
    dataset: AMOSDataset,
    count: int,
    batch_size: int,
    roi=(96, 96, 96),
    seed: int = 1337,
) -> Iterator[dict]:
    """Labeled-only batches over datalist[:count]
    (train_fully_supervised_unet_3D_AMOS22.py:159)."""
    rng = np.random.default_rng(seed)
    aug_rng = np.random.default_rng(seed + 1)
    while True:
        perm = rng.permutation(count)
        for start in range(0, count - batch_size + 1, batch_size):
            imgs, labs = [], []
            for i in perm[start : start + batch_size]:
                img, lab = dataset.augment(int(i), aug_rng, roi)
                imgs.append(img.astype(np.float32)[..., None])
                labs.append(lab.astype(np.uint8))
            yield {"image": np.stack(imgs), "label": np.stack(labs)}
