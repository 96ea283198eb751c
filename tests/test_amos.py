"""AMOS path: NIfTI reader round-trip, RAS orientation, transforms,
datalist, batch shapes."""
import json
import os

import numpy as np
import pytest

from icl_tpu.data import amos
from icl_tpu.data.nifti import load_nifti, save_nifti, to_ras, voxel_spacing


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(6, 7, 8)).astype(np.float32)
    affine = np.diag([1.5, 1.5, 2.0, 1.0])
    p = str(tmp_path / "vol.nii.gz")
    save_nifti(p, data, affine)
    vol = load_nifti(p)
    np.testing.assert_allclose(vol.data, data, rtol=1e-6)
    np.testing.assert_allclose(vol.affine, affine)
    np.testing.assert_allclose(voxel_spacing(vol.affine), [1.5, 1.5, 2.0])


def test_to_ras_flip():
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    # LPS affine (negative x and y direction) -> RAS needs flips on 0,1
    affine = np.diag([-1.0, -1.0, 1.0, 1.0])
    out, new_affine = to_ras(data, affine)
    assert out.shape == data.shape
    np.testing.assert_array_equal(out, np.flip(np.flip(data, 0), 1))
    assert new_affine[0, 0] > 0 and new_affine[1, 1] > 0


def test_to_ras_permutation():
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    # voxel axis 0 points along world z, axis 2 along world x
    affine = np.zeros((4, 4))
    affine[2, 0] = 1.0  # vox0 -> world z
    affine[1, 1] = 1.0  # vox1 -> world y
    affine[0, 2] = 1.0  # vox2 -> world x
    affine[3, 3] = 1.0
    out, new_affine = to_ras(data, affine)
    assert out.shape == (4, 3, 2)
    assert new_affine[0, 0] > 0 and new_affine[1, 1] > 0 and new_affine[2, 2] > 0


def test_scale_intensity_and_crop():
    img = np.full((8, 8, 8), -1000.0, np.float32)
    img[2:6, 3:7, 1:5] = 100.0
    lab = (img > 0).astype(np.uint8)
    scaled = amos.scale_intensity_range(img)
    assert scaled.min() == 0.0 and scaled.max() <= 1.0
    ci, cl = amos.crop_foreground(scaled, lab)
    assert ci.shape == (4, 4, 4)
    assert cl.all()


def test_spatial_pad_and_crop():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(4, 10, 5)).astype(np.float32)
    lab = np.zeros_like(img, np.uint8)
    pi, pl = amos.spatial_pad(img, lab, (8, 8, 8))
    assert pi.shape == (8, 10, 8)
    ci, cl = amos.rand_spatial_crop(pi, pl, (8, 8, 8), rng)
    assert ci.shape == (8, 8, 8)


@pytest.fixture
def synth_amos(tmp_path):
    """Tiny Decathlon-style AMOS tree with .nii.gz volumes."""
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imagesTr"
    lab_dir = tmp_path / "labelsTr"
    img_dir.mkdir()
    lab_dir.mkdir()
    training = []
    for i in range(4):
        shape = (24, 28, 20)
        img = rng.normal(50.0, 30.0, size=shape).astype(np.float32)
        lab = np.zeros(shape, np.uint8)
        lab[6:18, 8:20, 5:15] = rng.integers(0, 4)
        save_nifti(str(img_dir / f"amos_{i:04d}.nii.gz"), img, np.diag([2., 2., 3., 1.]))
        save_nifti(str(lab_dir / f"amos_{i:04d}.nii.gz"), lab, np.diag([2., 2., 3., 1.]))
        training.append({"image": f"imagesTr/amos_{i:04d}.nii.gz",
                         "label": f"labelsTr/amos_{i:04d}.nii.gz"})
    spec = {"training": training, "validation": training[:2]}
    jpath = tmp_path / "dataset_semi_ct.json"
    jpath.write_text(json.dumps(spec))
    return str(jpath)


def test_amos_dataset_and_batches(synth_amos):
    datalist = amos.load_decathlon_datalist(synth_amos, "training")
    assert len(datalist) == 4
    assert os.path.isabs(datalist[0]["image"])
    ds = amos.AMOSDataset(datalist)
    img, lab = ds.preprocessed(0)
    assert img.ndim == 3 and lab.shape == img.shape
    assert 0.0 <= img.min() and img.max() <= 1.0

    gen = amos.amos_train_batches(ds, labeled_count=2, total_count=4,
                                  batch_size=2, labeled_bs=1, roi=(16, 16, 16),
                                  seed=0)
    b = next(gen)
    assert b["image"].shape == (2, 16, 16, 16, 1)
    assert b["label"].shape == (2, 16, 16, 16)
