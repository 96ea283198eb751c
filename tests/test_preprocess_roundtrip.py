"""End-to-end data path: synthetic NIfTI → preprocess_acdc → ACDCDataset →
train batches (SURVEY.md §4 integration tier)."""
import subprocess
import sys

import numpy as np

from icl_tpu.data.acdc import ACDCDataset
from icl_tpu.data.nifti import save_nifti
from icl_tpu.data.pipeline import supervised_batches


def test_acdc_preprocess_roundtrip(tmp_path):
    raw = tmp_path / "raw" / "patient001"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for frame in ("01", "12"):
        img = rng.normal(100, 40, size=(20, 24, 6)).astype(np.float32)
        lab = rng.integers(0, 4, size=(20, 24, 6)).astype(np.uint8)
        save_nifti(str(raw / f"patient001_frame{frame}.nii.gz"), img)
        save_nifti(str(raw / f"patient001_frame{frame}_gt.nii.gz"), lab)

    out = tmp_path / "ACDC"
    res = subprocess.run(
        [sys.executable, "scripts/preprocess_acdc.py",
         "--input_glob", str(tmp_path / "raw" / "*" / "*_frame[0-9][0-9].nii.gz"),
         "--output_dir", str(out)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr
    assert "Converted 2 ACDC volumes" in res.stdout

    ds = ACDCDataset(str(out), "train")
    assert len(ds) == 12  # 2 volumes × 6 slices
    item = ds[0]
    assert item["image"].ndim == 2
    assert 0.0 <= item["image"].min() and item["image"].max() <= 1.0

    gen = supervised_batches(ds, batch_size=4, patch_size=(16, 16), seed=0)
    b = next(gen)
    assert b["image"].shape == (4, 16, 16, 1)
    assert b["label"].shape == (4, 16, 16)
