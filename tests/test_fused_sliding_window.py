"""Fused on-device sliding-window stitcher vs the chunked host stitcher."""
import numpy as np

import jax.numpy as jnp

from icl_tpu.eval.infer3d import (
    make_fused_sliding_window,
    make_patch_predictor,
    sliding_window_predict,
)


class _ToyNet:
    def apply(self, variables, x, train=False, inference=False):
        x = x[..., 0]
        return jnp.stack([-x, x], axis=-1)


def test_fused_matches_host_stitcher():
    rng = np.random.default_rng(0)
    image = rng.normal(size=(20, 18, 22)).astype(np.float32)
    patch = (8, 8, 8)

    probs_fn = make_patch_predictor(_ToyNet(), patch, sw_batch=3)
    # host stitcher pads small volumes symmetrically; use a volume larger
    # than the patch so both paths see identical geometry modulo padding
    want = sliding_window_predict(
        probs_fn, {}, image, 2, patch, stride_xy=5, stride_z=4, sw_batch=3
    )

    fused = make_fused_sliding_window(_ToyNet(), 2, patch, sw_batch=3)
    # bucket=1 → identical volume shape, identical grid
    got = fused({}, image, stride_xy=5, stride_z=4, bucket=1)
    np.testing.assert_array_equal(got, want)


def test_fused_bucketed_padding():
    rng = np.random.default_rng(1)
    image = rng.normal(size=(19, 17, 21)).astype(np.float32)
    fused = make_fused_sliding_window(_ToyNet(), 2, (8, 8, 8), sw_batch=4)
    got = fused({}, image, stride_xy=6, stride_z=6, bucket=8)
    assert got.shape == image.shape
    # prediction must follow sign of intensity in the interior
    interior = np.abs(image) > 0.5
    acc = np.mean((got == 1)[interior] == (image > 0)[interior])
    assert acc > 0.99


def test_fused_mesh_sharded_matches_single_device():
    """mesh= distributes patch chunks over the 'data' axis (shard_map +
    psum stitch); the label map must equal the single-device fused path
    bit for bit (weight-0 padding chunks are score- and count-neutral).
    8 virtual CPU devices via conftest."""
    import jax

    from icl_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(data=len(jax.devices()))
    rng = np.random.default_rng(2)
    image = rng.normal(size=(20, 18, 22)).astype(np.float32)
    patch = (8, 8, 8)

    single = make_fused_sliding_window(_ToyNet(), 2, patch, sw_batch=3)
    want = single({}, image, stride_xy=5, stride_z=4, bucket=1)

    sharded = make_fused_sliding_window(_ToyNet(), 2, patch, sw_batch=3,
                                        mesh=mesh)
    got = sharded({}, image, stride_xy=5, stride_z=4, bucket=1)
    np.testing.assert_array_equal(got, want)


def test_fused_mesh_sharded_fewer_chunks_than_devices():
    """Degenerate grid (1 real chunk, 8 devices): the divisibility
    padding inserts whole weight-0 chunks on 7 devices; result must
    still match the host stitcher."""
    import jax

    from icl_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(data=len(jax.devices()))
    rng = np.random.default_rng(3)
    image = rng.normal(size=(8, 8, 8)).astype(np.float32)
    patch = (8, 8, 8)

    probs_fn = make_patch_predictor(_ToyNet(), patch, sw_batch=2)
    want = sliding_window_predict(
        probs_fn, {}, image, 2, patch, stride_xy=8, stride_z=8, sw_batch=2
    )
    sharded = make_fused_sliding_window(_ToyNet(), 2, patch, sw_batch=2,
                                        mesh=mesh)
    got = sharded({}, image, stride_xy=8, stride_z=8, bucket=1)
    np.testing.assert_array_equal(got, want)
