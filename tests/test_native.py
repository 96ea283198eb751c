"""Native C++ augmentation kernels vs scipy."""
import numpy as np
import pytest
from scipy import ndimage
from scipy.ndimage import zoom as nd_zoom

from icl_tpu import native


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_zoom_matches_scipy():
    rng = np.random.default_rng(0)
    for (h, w), (oh, ow) in [((20, 24), (16, 16)), ((16, 16), (32, 32)),
                             ((30, 17), (16, 16))]:
        img = rng.normal(size=(h, w)).astype(np.float32)
        want = nd_zoom(img, (oh / h, ow / w), order=0)
        got = native.zoom_nearest(img, (oh, ow))
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_zoom_u8_matches_scipy():
    rng = np.random.default_rng(1)
    lab = rng.integers(0, 4, size=(21, 19)).astype(np.uint8)
    want = nd_zoom(lab, (16 / 21, 16 / 19), order=0)
    got = native.zoom_nearest(lab, (16, 16))
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_rotate_matches_scipy():
    rng = np.random.default_rng(2)
    img = rng.normal(size=(24, 20)).astype(np.float32)
    for angle in (-19, -7, 0, 5, 18):
        want = ndimage.rotate(img, angle, order=0, reshape=False)
        got = native.rotate_nearest(img, angle)
        frac = np.mean(got == want)
        assert frac > 0.98, (angle, frac)  # .5-rounding ties may differ
