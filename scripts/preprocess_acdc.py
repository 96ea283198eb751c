#!/usr/bin/env python
"""Offline ACDC preprocessing: NIfTI frames → per-volume + per-slice h5.

Reference: `code/dataloaders/acdc_data_processing.py` — min-max
normalize each volume to [0,1] (float32), write the volume h5 and one h5
per slice. Paths are CLI flags instead of hard-coded cluster paths.

Note a reference defect NOT replicated: the reference script writes the
label under the h5 key 'mask' while the training loader reads 'label'
(dataset.py:64); we write 'label' to match the loader.
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_glob", type=str, required=True,
                   help="e.g. '/data/ACDC/training/patient*/*_frame[0-9][0-9].nii.gz'")
    p.add_argument("--output_dir", type=str, required=True)
    args = p.parse_args()

    os.makedirs(os.path.join(args.output_dir, "volumes"), exist_ok=True)
    os.makedirs(os.path.join(args.output_dir, "slices"), exist_ok=True)

    slice_num = 0
    train_slices, volumes = [], []
    for case in sorted(glob.glob(args.input_glob)):
        msk_path = case.replace(".nii", "_gt.nii")
        if not os.path.exists(msk_path):
            continue
        item = os.path.basename(case).split(".")[0]
        image = load_nifti(case).data
        mask = load_nifti(msk_path).data
        # reference reads via sitk GetArrayFromImage = [z, y, x]; our
        # reader returns [x, y, z] Fortran order — transpose to match
        image = np.transpose(image, (2, 1, 0))
        mask = np.transpose(mask, (2, 1, 0))
        if image.shape != mask.shape:
            print(f"shape mismatch for {item}, skipping")
            continue

        image = (image - image.min()) / max(image.max() - image.min(), 1e-8)
        image = image.astype(np.float32)

        with h5py.File(os.path.join(args.output_dir, "volumes", f"{item}.h5"), "w") as f:
            f.create_dataset("image", data=image, compression="gzip")
            f.create_dataset("label", data=mask.astype(np.uint8), compression="gzip")
        volumes.append(item)

        for si in range(image.shape[0]):
            sid = f"{item}_slice_{si}"
            with h5py.File(os.path.join(args.output_dir, "slices", f"{sid}.h5"), "w") as f:
                f.create_dataset("image", data=image[si], compression="gzip")
                f.create_dataset("label", data=mask[si].astype(np.uint8),
                                 compression="gzip")
            train_slices.append(sid)
            slice_num += 1

    with open(os.path.join(args.output_dir, "train_slices.list"), "w") as f:
        f.write("\n".join(train_slices) + "\n")
    with open(os.path.join(args.output_dir, "all_volumes.list"), "w") as f:
        f.write("\n".join(volumes) + "\n")
    print(f"Converted {len(volumes)} ACDC volumes to {slice_num} 2D slices")


if __name__ == "__main__":
    main()
