"""Synthetic dataset fixtures in the on-disk formats the real pipelines
read — used by tests and benchmarks (the reference ships no fixtures;
SURVEY.md §4 test strategy)."""
from __future__ import annotations

import os

import h5py
import numpy as np


def make_synthetic_acdc(
    root: str,
    num_slices: int = 16,
    num_volumes: int = 3,
    slice_size: int = 32,
    vol_depth: int = 4,
    num_classes: int = 4,
    seed: int = 0,
) -> str:
    """Create a tiny ACDC-format tree: train_slices.list / val_test.list,
    slices/*.h5, volumes/*.h5. Labels are blobby circles so dice is
    learnable in a few steps."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "slices"), exist_ok=True)
    os.makedirs(os.path.join(root, "volumes"), exist_ok=True)

    def make_pair(h, w):
        yy, xx = np.mgrid[0:h, 0:w]
        label = np.zeros((h, w), dtype=np.uint8)
        image = rng.normal(0.0, 0.1, size=(h, w)).astype(np.float32)
        for cls in range(1, num_classes):
            cy, cx = rng.integers(4, h - 4), rng.integers(4, w - 4)
            r = rng.integers(2, max(3, h // 6))
            mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r**2
            label[mask] = cls
            image[mask] += 0.5 * cls
        return image, label

    train_ids = []
    for i in range(num_slices):
        sid = f"synth{i:03d}_slice_{i}"
        train_ids.append(sid)
        image, label = make_pair(slice_size, slice_size)
        with h5py.File(os.path.join(root, "slices", f"{sid}.h5"), "w") as f:
            f.create_dataset("image", data=image)
            f.create_dataset("label", data=label)

    val_ids = []
    for i in range(num_volumes):
        vid = f"synthvol{i:03d}"
        val_ids.append(vid)
        vol_img = np.zeros((vol_depth, slice_size, slice_size), dtype=np.float32)
        vol_lab = np.zeros((vol_depth, slice_size, slice_size), dtype=np.uint8)
        for d in range(vol_depth):
            vol_img[d], vol_lab[d] = make_pair(slice_size, slice_size)
        with h5py.File(os.path.join(root, "volumes", f"{vid}.h5"), "w") as f:
            f.create_dataset("image", data=vol_img)
            f.create_dataset("label", data=vol_lab)

    with open(os.path.join(root, "train_slices.list"), "w") as f:
        f.write("\n".join(train_ids) + "\n")
    with open(os.path.join(root, "val_test.list"), "w") as f:
        f.write("\n".join(val_ids) + "\n")
    return root


def make_synthetic_brats(
    root: str,
    num_cases: int = 6,
    size: int = 48,
    seed: int = 0,
) -> str:
    """Tiny BraTS2019-format tree: train.txt / val.txt, data/*.h5 volumes
    with 'image' [D,H,W] and 'label' [D,H,W] (binary whole tumor)."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    ids = []
    for i in range(num_cases):
        cid = f"synthbrats{i:03d}"
        ids.append(cid)
        img = rng.normal(0.0, 0.1, size=(size, size, size)).astype(np.float32)
        lab = np.zeros((size, size, size), dtype=np.uint8)
        zz, yy, xx = np.mgrid[0:size, 0:size, 0:size]
        cz, cy, cx = rng.integers(8, size - 8, size=3)
        r = rng.integers(4, size // 4)
        mask = (zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2 < r**2
        lab[mask] = 1
        img[mask] += 1.0
        with h5py.File(os.path.join(root, "data", f"{cid}.h5"), "w") as f:
            f.create_dataset("image", data=img)
            f.create_dataset("label", data=lab)
    n_train = max(1, num_cases - 2)
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(ids[:n_train]) + "\n")
    # the reference ships both val.txt and val_test.txt manifests
    # (data/BraTS2019/, val_3D.py / test_3D_BraTS.py read val_test.txt)
    for name in ("val.txt", "val_test.txt"):
        with open(os.path.join(root, name), "w") as f:
            f.write("\n".join(ids[n_train:]) + "\n")
    return root


def make_synthetic_amos(
    root: str,
    num_cases: int = 4,
    shape=(96, 96, 72),
    spacing=(2.0, 2.0, 3.0),
    num_classes: int = 16,
    seed: int = 0,
) -> str:
    """Tiny Decathlon-style AMOS22 tree (.nii.gz CT volumes + labels +
    dataset_semi_ct.json). Source spacing (2,2,3) resamples to
    ~(127,127,107) voxels at the protocol's (1.5,1.5,2.0) — large enough
    for 96³ crops. Returns the JSON path."""
    import json

    from icl_tpu.data.nifti import save_nifti

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "imagesTr")
    lab_dir = os.path.join(root, "labelsTr")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    affine = np.diag([spacing[0], spacing[1], spacing[2], 1.0])
    training = []
    for i in range(num_cases):
        img = rng.normal(60.0, 50.0, size=shape).astype(np.float32)
        lab = np.zeros(shape, np.uint8)
        for organ in range(1, min(num_classes, 6)):
            cz, cy, cx = rng.integers(12, np.asarray(shape) - 12)
            r = int(rng.integers(4, 10))
            zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]]
            mask = (zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2 < r**2
            lab[mask] = organ
            img[mask] += 120.0
        save_nifti(os.path.join(img_dir, f"amos_{i:04d}.nii.gz"), img, affine)
        save_nifti(os.path.join(lab_dir, f"amos_{i:04d}.nii.gz"), lab, affine)
        training.append({"image": f"imagesTr/amos_{i:04d}.nii.gz",
                         "label": f"labelsTr/amos_{i:04d}.nii.gz"})
    spec = {"training": training[:-1], "validation": training[-1:]}
    jpath = os.path.join(root, "dataset_semi_ct.json")
    with open(jpath, "w") as f:
        json.dump(spec, f)
    return jpath
