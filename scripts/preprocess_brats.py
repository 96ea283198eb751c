#!/usr/bin/env python
"""Offline BraTS2019 preprocessing: FLAIR NIfTI → normalized h5 volumes.

Reference: `code/dataloaders/brats_proprecessing.py` — brain bounding
box crop (nonzero voxels, :10-21), 99.9% cumulative-intensity clip
(:81-95), nonzero-region mean/std normalization (:62-78), whole-tumor
label binarization (lab[lab>0]=1), written per case. Output goes to a
single `data/{case}.h5` tree matching the BraTS2019 loader
(brats2019.py:39) instead of the reference's separate flair/label NIfTI
trees.
"""
import argparse

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import os

import h5py
import numpy as np

from icl_tpu.data.nifti import load_nifti


def brain_bbox(data, gt):
    vox = np.where(data != 0)
    sl = tuple(slice(int(v.min()), int(v.max())) for v in vox)
    return data[sl], gt[sl]


def clip_at_percentile(img, percent=0.999):
    """Clip above the intensity where the cumulative distribution reaches
    `percent` (skimage exposure.cumulative_distribution equivalent)."""
    values, counts = np.unique(img, return_counts=True)
    cdf = np.cumsum(counts) / img.size
    watershed = values[cdf >= percent][0]
    return np.clip(img, img.min(), watershed)


def normalize_nonzero(volume):
    pixels = volume[volume > 0]
    return ((volume - pixels.mean()) / pixels.std()).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_glob", type=str, required=True,
                   help="e.g. '/data/BraTS19/*/*_flair.nii.gz'")
    p.add_argument("--output_dir", type=str, required=True)
    args = p.parse_args()

    out_data = os.path.join(args.output_dir, "data")
    os.makedirs(out_data, exist_ok=True)
    cases = []
    for path in sorted(glob.glob(args.input_glob)):
        seg_path = path.replace("flair", "seg")
        if not os.path.exists(seg_path):
            print(f"no seg for {path}, skipping")
            continue
        data = np.transpose(load_nifti(path).data, (2, 1, 0))
        lab = np.transpose(load_nifti(seg_path).data, (2, 1, 0))
        img, lab = brain_bbox(data, lab)
        img = clip_at_percentile(img, 0.999)
        img = normalize_nonzero(img)
        lab = (lab > 0).astype(np.uint8)
        uid = os.path.basename(path).replace("_flair.nii.gz", "")
        with h5py.File(os.path.join(out_data, f"{uid}.h5"), "w") as f:
            f.create_dataset("image", data=img, compression="gzip")
            f.create_dataset("label", data=lab, compression="gzip")
        cases.append(uid)
    with open(os.path.join(args.output_dir, "all_cases.txt"), "w") as f:
        f.write("\n".join(cases) + "\n")
    print(f"Processed {len(cases)} BraTS cases")


if __name__ == "__main__":
    main()
