"""Multi-host input sharding: per-host contiguous blocks reassemble the
exact global batch, and the global array matches single-host compute."""
import numpy as np

import jax
from jax.sharding import PartitionSpec as P

from icl_tpu.parallel.mesh import create_mesh
from icl_tpu.parallel.multihost import host_local_batches, host_slice, make_global_array


def _global_batch(rng, n=16):
    return {
        "image": rng.normal(size=(n, 8, 8, 1)).astype(np.float32),
        "label": rng.integers(0, 4, size=(n, 8, 8)).astype(np.int32),
    }


def test_host_slices_reassemble():
    rng = np.random.default_rng(0)
    b = _global_batch(rng)
    parts = [host_slice(b, p, 4) for p in range(4)]
    for k in b:
        np.testing.assert_array_equal(
            np.concatenate([p[k] for p in parts]), b[k]
        )


def test_host_local_stream_deterministic():
    def gen(seed):
        rng = np.random.default_rng(seed)
        while True:
            yield _global_batch(rng)

    # two "hosts" with the same seed see complementary rows of the SAME batch
    h0 = host_local_batches(gen(7), 0, 2)
    h1 = host_local_batches(gen(7), 1, 2)
    a, b = next(h0), next(h1)
    g = _global_batch(np.random.default_rng(7))
    np.testing.assert_array_equal(np.concatenate([a["image"], b["image"]]), g["image"])


def test_make_global_array_single_process():
    mesh = create_mesh(data=8, model=1)
    rng = np.random.default_rng(1)
    b = _global_batch(rng)
    garr = make_global_array(b, mesh, P("data"))
    assert garr["image"].shape == b["image"].shape
    np.testing.assert_array_equal(np.asarray(garr["image"]), b["image"])


def test_launch_batches_single_process():
    """launch_batches (the shared CLI launch contract): single-process
    returns (None, Prefetcher) yielding the global stream unchanged;
    the pcount>1 branch is covered by tests/test_two_process.py."""
    from icl_tpu.data.pipeline import Prefetcher
    from icl_tpu.parallel.multihost import launch_batches

    rng = np.random.default_rng(3)
    want = _global_batch(rng)

    def gen():
        yield dict(want)

    mesh, batches = launch_batches(gen(), process_count=1)
    assert mesh is None
    assert isinstance(batches, Prefetcher)
    got = next(iter(batches))
    np.testing.assert_array_equal(got["image"], want["image"])
