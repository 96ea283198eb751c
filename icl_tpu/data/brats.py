"""BraTS2019 h5 dataset + 3D transforms (reference
`code/dataloaders/brats2019.py:11-188`).

On-disk layout: {root}/train.txt, {root}/val.txt, {root}/val_test.txt,
{root}/data/{case}.h5 with 'image' [D,H,W] float and 'label' [D,H,W]
(binary whole tumor after preprocessing).

Transforms (train order: RandomRotFlip → RandomCrop(96³) → tensor,
train_inherent_consistent_unet_3D_BraTS.py:69-73); outputs channel-last
[D,H,W,1] float32 + [D,H,W] uint8.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional

import h5py
import numpy as np

from icl_tpu.data.sampler import two_stream_batches


class BraTS2019Dataset:
    def __init__(self, base_dir: str, split: str = "train",
                 num: Optional[int] = None, cache: bool = False):
        # cache is OFF by default: 250 full BraTS volumes are tens of GB;
        # enable for small subsets or big-RAM hosts.
        self.base_dir = base_dir
        list_file = {"train": "train.txt", "test": "val.txt",
                     "val_test": "val_test.txt"}.get(split, f"{split}.txt")
        from icl_tpu.data.manifests import resolve_manifest

        with open(resolve_manifest(base_dir, list_file, "BraTS2019")) as f:
            self.image_list = [ln.strip().split(",")[0] for ln in f if ln.strip()]
        if num is not None:
            self.image_list = self.image_list[:num]
        self._cache: Optional[dict] = {} if cache else None

    def __len__(self) -> int:
        return len(self.image_list)

    def __getitem__(self, idx: int) -> dict:
        if self._cache is not None and idx in self._cache:
            image, label = self._cache[idx]
        else:
            case = self.image_list[idx]
            with h5py.File(os.path.join(self.base_dir, "data", f"{case}.h5"), "r") as f:
                image = f["image"][:]
                label = f["label"][:].astype(np.uint8)
            if self._cache is not None:
                self._cache[idx] = (image, label)
        return {"image": image, "label": label, "case": self.image_list[idx]}


def _pad_to_fit(image, label, output_size):
    """Reference padding rule: if any dim <= target, pad both sides by
    (target−dim)//2 + 3 (brats2019.py:96-106)."""
    if (
        label.shape[0] <= output_size[0]
        or label.shape[1] <= output_size[1]
        or label.shape[2] <= output_size[2]
    ):
        pw = max((output_size[0] - label.shape[0]) // 2 + 3, 0)
        ph = max((output_size[1] - label.shape[1]) // 2 + 3, 0)
        pd = max((output_size[2] - label.shape[2]) // 2 + 3, 0)
        pads = [(pw, pw), (ph, ph), (pd, pd)]
        image = np.pad(image, pads, mode="constant", constant_values=0)
        label = np.pad(label, pads, mode="constant", constant_values=0)
    return image, label


def random_crop_3d(image, label, output_size, rng: np.random.Generator):
    """RandomCrop with pad (brats2019.py:80-128)."""
    image, label = _pad_to_fit(image, label, output_size)
    w, h, d = image.shape
    w1 = int(rng.integers(0, w - output_size[0]))
    h1 = int(rng.integers(0, h - output_size[1]))
    d1 = int(rng.integers(0, d - output_size[2]))
    sl = (
        slice(w1, w1 + output_size[0]),
        slice(h1, h1 + output_size[1]),
        slice(d1, d1 + output_size[2]),
    )
    return image[sl], label[sl]


def center_crop_3d(image, label, output_size):
    """CenterCrop (brats2019.py:48-77)."""
    image, label = _pad_to_fit(image, label, output_size)
    w, h, d = image.shape
    w1 = int(round((w - output_size[0]) / 2.0))
    h1 = int(round((h - output_size[1]) / 2.0))
    d1 = int(round((d - output_size[2]) / 2.0))
    sl = (
        slice(w1, w1 + output_size[0]),
        slice(h1, h1 + output_size[1]),
        slice(d1, d1 + output_size[2]),
    )
    return image[sl], label[sl]


def random_rot_flip_3d(image, label, rng: np.random.Generator):
    """rot90 k∈{0..3} in the leading two axes + flip along axis∈{0,1}
    (brats2019.py:131-147)."""
    k = int(rng.integers(0, 4))
    axis = int(rng.integers(0, 2))
    image = np.flip(np.rot90(image, k), axis=axis).copy()
    label = np.flip(np.rot90(label, k), axis=axis).copy()
    return image, label


def random_noise_3d(image, rng, mu=0.0, sigma=0.1):
    """RandomNoise (brats2019.py:150-161; unused by entry scripts)."""
    noise = np.clip(sigma * rng.standard_normal(image.shape), -2 * sigma, 2 * sigma)
    return image + noise + mu


def create_onehot_label(label: np.ndarray, num_classes: int) -> np.ndarray:
    """CreateOnehotLabel (brats2019.py:163-174; unused by entry scripts):
    channel-LAST one-hot [D, H, W, C] float32."""
    onehot = np.zeros(label.shape + (num_classes,), np.float32)
    for c in range(num_classes):
        onehot[..., c] = (label == c).astype(np.float32)
    return onehot


def brats_train_batches(
    dataset: BraTS2019Dataset,
    labeled_count: int,
    total_count: int,
    batch_size: int,
    labeled_bs: int,
    patch_size=(96, 96, 96),
    seed: int = 1337,
) -> Iterator[dict]:
    """[labeled…, unlabeled…] semi-supervised 3D batches
    (train_…unet_3D_BraTS.py:77-84)."""
    labeled_idxs = list(range(0, labeled_count))
    unlabeled_idxs = list(range(labeled_count, total_count))
    aug_rng = np.random.default_rng(seed + 1)
    for idxs in two_stream_batches(
        labeled_idxs, unlabeled_idxs, batch_size, batch_size - labeled_bs, seed=seed
    ):
        imgs, labs = [], []
        for i in idxs:
            item = dataset[i]
            img, lab = random_rot_flip_3d(item["image"], item["label"], aug_rng)
            img, lab = random_crop_3d(img, lab, patch_size, aug_rng)
            imgs.append(img.astype(np.float32)[..., None])
            labs.append(lab.astype(np.uint8))
        yield {"image": np.stack(imgs), "label": np.stack(labs)}


def brats_supervised_batches(
    dataset: BraTS2019Dataset,
    batch_size: int,
    patch_size=(96, 96, 96),
    seed: int = 1337,
) -> Iterator[dict]:
    """Labeled-only 3D batches (train_fully_supervised_unet_3D_BraTS.py)."""
    rng = np.random.default_rng(seed)
    aug_rng = np.random.default_rng(seed + 1)
    n = len(dataset)
    while True:
        perm = rng.permutation(n)
        for start in range(0, n - batch_size + 1, batch_size):
            imgs, labs = [], []
            for i in perm[start : start + batch_size]:
                item = dataset[int(i)]
                img, lab = random_rot_flip_3d(item["image"], item["label"], aug_rng)
                img, lab = random_crop_3d(img, lab, patch_size, aug_rng)
                imgs.append(img.astype(np.float32)[..., None])
                labs.append(lab.astype(np.uint8))
            yield {"image": np.stack(imgs), "label": np.stack(labs)}
