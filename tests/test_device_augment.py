"""Device-side augmentation vs scipy host semantics."""
import numpy as np
from scipy import ndimage
from scipy.ndimage import zoom as nd_zoom

import jax
import jax.numpy as jnp

from icl_tpu.data.device_augment import _rotate_nearest, augment_batch, zoom_nearest


def test_zoom_nearest_matches_scipy():
    rng = np.random.default_rng(0)
    for s, out in [(20, 16), (16, 32), (30, 16)]:
        img = rng.normal(size=(s, s)).astype(np.float32)
        want = nd_zoom(img, (out / s, out / s), order=0)
        got = np.asarray(zoom_nearest(jnp.asarray(img), out))
        assert got.shape == want.shape
        frac = np.mean(got == want)
        # identical index maps except possible .5-rounding ties
        assert frac > 0.95, frac


def test_rotate_nearest_matches_scipy():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(24, 24)).astype(np.float32)
    for angle in (-17, -5, 9, 19):
        want = ndimage.rotate(img, angle, order=0, reshape=False)
        got = np.asarray(_rotate_nearest(jnp.asarray(img), jnp.float32(angle)))
        frac = np.mean(np.isclose(got, want))
        assert frac > 0.92, (angle, frac)  # rounding-tie pixels differ


def test_augment_batch_shapes_and_label_preservation():
    rng = np.random.default_rng(2)
    imgs = rng.normal(size=(6, 20, 20)).astype(np.float32)
    labs = rng.integers(0, 4, size=(6, 20, 20)).astype(np.uint8)
    out_i, out_l = augment_batch(jnp.asarray(imgs), jnp.asarray(labs),
                                 jax.random.PRNGKey(0), 16)
    assert out_i.shape == (6, 16, 16, 1)
    assert out_l.shape == (6, 16, 16)
    assert set(np.unique(np.asarray(out_l))) <= {0, 1, 2, 3}
