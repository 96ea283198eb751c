"""MONAI-bitwise Spacing resampler vs a torch grid_sample oracle
(VERDICT r1 item 4): the numpy implementation must match
F.grid_sample(mode, padding_mode='border', align_corners=False) through
the same dst→src voxel affine map, on diagonal AND oblique affines."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from icl_tpu.data import resample as rs  # noqa: E402


def torch_grid_sample_oracle(vol, src_affine, dst_affine, out_shape, mode):
    """Independent path: build the normalized grid exactly as MONAI's
    AffineTransform/affine_grid would (align_corners=False) and let
    torch's own grid_sample interpolate."""
    xform = np.linalg.inv(src_affine) @ dst_affine
    grids = list(np.meshgrid(*[np.arange(s, dtype=np.float64) for s in out_shape],
                             indexing="ij"))
    dst = np.stack(grids + [np.ones_like(grids[0])])
    src = np.einsum("ij,j...->i...", xform[:3], dst)  # [3, D, H, W]
    size = vol.shape
    # align_corners=False normalization: norm = (2*v + 1)/size - 1
    norm = [(2.0 * src[a] + 1.0) / size[a] - 1.0 for a in range(3)]
    # grid last dim is (x, y, z) = (axis2, axis1, axis0)
    grid = np.stack([norm[2], norm[1], norm[0]], axis=-1)[None]
    out = F.grid_sample(
        torch.from_numpy(vol.astype(np.float64))[None, None],
        torch.from_numpy(grid),
        mode=mode, padding_mode="border", align_corners=False,
    )
    return out[0, 0].numpy()


def _diag_affine(spacing, origin=(0.0, 0.0, 0.0)):
    a = np.eye(4)
    a[:3, :3] = np.diag(spacing)
    a[:3, 3] = origin
    return a


def _oblique_affine():
    a = _diag_affine((0.8, 0.7, 3.0), origin=(-10.0, 5.0, 2.0))
    # small in-plane rotation (oblique scan)
    th = 0.07
    rot = np.eye(4)
    rot[0, 0] = np.cos(th); rot[0, 1] = -np.sin(th)
    rot[1, 0] = np.sin(th); rot[1, 1] = np.cos(th)
    return rot @ a


@pytest.mark.parametrize("affine_fn,mode", [
    (lambda: _diag_affine((0.7, 0.7, 5.0)), "bilinear"),
    (lambda: _diag_affine((0.7, 0.7, 5.0)), "nearest"),
    (_oblique_affine, "bilinear"),
    (_oblique_affine, "nearest"),
])
def test_resample_matches_torch_grid_sample(affine_fn, mode):
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(19, 23, 11)).astype(np.float32)
    affine = affine_fn()
    pixdim = (1.5, 1.5, 2.0)

    new_affine = rs.zoom_affine(affine, pixdim)
    out_shape, offset = rs.compute_shape_offset(vol.shape, affine, new_affine)
    new_affine[:3, 3] = offset

    ours = rs.affine_resample(vol.astype(np.float64), affine, new_affine,
                              out_shape, mode)
    oracle = torch_grid_sample_oracle(vol, affine, new_affine, out_shape, mode)
    if mode == "nearest":
        np.testing.assert_array_equal(ours, oracle)
    else:
        np.testing.assert_allclose(ours, oracle, atol=1e-10, rtol=1e-12)


def test_shape_offset_diagonal_formula():
    """For RAS diagonal affines the MONAI shape is
    round((n-1)·old/new + 1) — NOT scipy-zoom's round(n·old/new)."""
    affine = _diag_affine((0.7, 0.7, 5.0))
    new_affine = rs.zoom_affine(affine, (1.5, 1.5, 2.0))
    shape, offset = rs.compute_shape_offset((100, 50, 20), affine, new_affine)
    want = [round((n - 1) * o / t + 1) for n, o, t in
            zip((100, 50, 20), (0.7, 0.7, 5.0), (1.5, 1.5, 2.0))]
    assert list(shape) == want
    np.testing.assert_allclose(offset, affine[:3, 3], atol=1e-12)


def test_monai_spacing_resample_end_to_end():
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(17, 13, 9)).astype(np.float32)
    lab = rng.integers(0, 16, size=(17, 13, 9)).astype(np.uint8)
    affine = _diag_affine((0.9, 1.1, 4.0), origin=(3.0, -2.0, 7.0))

    img_out, aff_img = rs.monai_spacing_resample(vol, affine, mode="bilinear")
    lab_out, aff_lab = rs.monai_spacing_resample(lab, affine, mode="nearest")
    assert img_out.shape == lab_out.shape
    assert img_out.dtype == np.float32 and lab_out.dtype == np.uint8
    np.testing.assert_allclose(aff_img, aff_lab)
    # nearest on an integer label keeps the label alphabet
    assert set(np.unique(lab_out)) <= set(np.unique(lab))

    oracle = torch_grid_sample_oracle(vol, affine, aff_img, img_out.shape,
                                      "bilinear")
    np.testing.assert_allclose(img_out, oracle.astype(np.float32), atol=1e-6)


def _shear_affine():
    a = _diag_affine((0.8, 0.7, 3.0), origin=(1.0, 2.0, 3.0))
    shear = np.eye(4)
    shear[0, 1] = 0.15  # voxel axis 1 leans into world x
    shear[1, 2] = -0.1
    return a @ shear


def test_zoom_affine_shear_free_equals_column_rescale():
    """For shear-free affines the Cholesky construction reduces to
    rescaling each direction column to the target norm."""
    affine = _oblique_affine()
    pixdim = (1.5, 1.5, 2.0)
    got = rs.zoom_affine(affine, pixdim)
    d = affine[:3, :3]
    norms = np.sqrt((d * d).sum(axis=0))
    want = np.eye(4)
    want[:3, :3] = d / norms * np.asarray(pixdim)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_zoom_affine_drops_shear_keeps_norms_and_signs():
    """MONAI zoom_affine (diagonal=False) Cholesky semantics on a
    SHEARED affine: output directions are orthogonal (shear dropped),
    column norms equal pixdim, and axis orientation signs survive."""
    affine = _shear_affine()
    affine[:3, 2] *= -1.0  # flip one axis (e.g. LPS-style scan)
    pixdim = (1.5, 1.5, 2.0)
    got = rs.zoom_affine(affine, pixdim)
    d = got[:3, :3]
    gram = d.T @ d
    np.testing.assert_allclose(gram, np.diag(np.asarray(pixdim) ** 2), atol=1e-10)
    np.testing.assert_allclose(np.sqrt(np.diag(gram)), pixdim, atol=1e-10)
    # orientation: each new column must point the same general way as the
    # rotation factor of the original (positive dot with the original
    # column for the unflipped axes; the flip itself is encoded in the
    # sign of the Cholesky diagonal, matching nibabel/MONAI)
    rzs = affine[:3, :3]
    zs = np.linalg.cholesky(rzs.T @ rzs).T
    want = (rzs @ np.linalg.inv(zs)) @ np.diag(np.sign(np.diag(zs)) * np.asarray(pixdim))
    np.testing.assert_allclose(d, want, atol=1e-12)
    assert got[3, 3] == 1.0 and np.all(got[:3, 3] == 0.0)


def test_zoom_affine_short_pixdim_fills_from_affine():
    """pixdim shorter than the spatial rank keeps the remaining axes'
    original spacing (MONAI: np.append(scale, norm[len(scale):]))."""
    affine = _diag_affine((0.8, 0.7, 3.0))
    got = rs.zoom_affine(affine, (1.5, 1.5))
    np.testing.assert_allclose(
        np.sqrt((got[:3, :3] ** 2).sum(axis=0)), (1.5, 1.5, 3.0), atol=1e-12
    )
