"""ACDC h5 dataset (reference `code/dataloaders/dataset.py:20-72`).

Layout on disk (produced by the offline preprocessing,
`dataloaders/acdc_data_processing.py`):

    {root}/train_slices.list      one slice id per line
    {root}/val_test.list          one volume id per line
    {root}/slices/{id}.h5         datasets 'image' [H,W], 'label' [H,W]
    {root}/volumes/{id}.h5        datasets 'image' [D,H,W], 'label' [D,H,W]

Train items are per-slice 2D; val items are whole volumes. The labeled
subset is a *prefix* of the (fixed) train list — `patients_to_slices`
maps patient counts to slice counts (train_…unet_2D.py:52-62).
"""
from __future__ import annotations

import os
from typing import Optional

import h5py

# ACDC patient-count -> labeled-slice-count lookup
# (train_inherent_consistent_unet_2D.py:52-62).
ACDC_PATIENTS_TO_SLICES = {
    3: 68, 7: 136, 14: 256, 21: 396, 28: 512, 35: 664, 140: 1312,
}


def patients_to_slices(dataset_path: str, patients_num: int) -> int:
    if "ACDC" in dataset_path:
        return ACDC_PATIENTS_TO_SLICES[int(patients_num)]
    # Prostate table kept for API parity (reference train script :57-59).
    prostate = {2: 27, 4: 53, 8: 120, 12: 179, 16: 256, 21: 312, 42: 623}
    return prostate[int(patients_num)]


class ACDCDataset:
    """Slice (train) / volume (val_test) reader.

    cache=True keeps decoded arrays in RAM after first read (the full
    ACDC train split is ~350MB; per-item h5 open/close otherwise
    dominates the single-core input pipeline — the reference hides this
    behind 8 DataLoader worker processes)."""

    def __init__(self, base_dir: str, split: str = "train",
                 num: Optional[int] = None, cache: bool = True):
        self.base_dir = base_dir
        self.split = split
        list_file = "train_slices.list" if split == "train" else "val_test.list"
        from icl_tpu.data.manifests import resolve_manifest

        # official split definition: root's own copy wins, else the
        # repo-vendored manifest (data/ACDC/*.list)
        with open(resolve_manifest(base_dir, list_file, "ACDC")) as f:
            self.sample_list = [ln.strip() for ln in f if ln.strip()]
        if num is not None and split == "train":
            self.sample_list = self.sample_list[:num]
        self._cache: Optional[dict] = {} if cache else None

    def __len__(self) -> int:
        return len(self.sample_list)

    def __getitem__(self, idx: int) -> dict:
        if self._cache is not None and idx in self._cache:
            image, label = self._cache[idx]
        else:
            case = self.sample_list[idx]
            sub = "slices" if self.split == "train" else "volumes"
            path = os.path.join(self.base_dir, sub, f"{case}.h5")
            with h5py.File(path, "r") as h5f:
                image = h5f["image"][:]
                label = h5f["label"][:]
            if self._cache is not None:
                self._cache[idx] = (image, label)
        return {"image": image, "label": label, "idx": idx,
                "case": self.sample_list[idx]}
