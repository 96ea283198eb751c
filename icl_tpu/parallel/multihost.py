"""Multi-host data-parallel input pipeline.

The reference has no distributed input handling (its rank-sharding
Sampler in utils/data_utils.py:22-66 is dead code). TPU-native design:
every host runs the SAME seeded TwoStream sampler, producing an
identical logical global batch in the reference's [labeled…, unlabeled…]
layout; each host materializes only its contiguous row block (the rows
that live on its devices under a 'data'-axis NamedSharding) and the
global array is assembled with `jax.make_array_from_process_local_data`.
The jitted step keeps slicing `batch[:labeled_bs]` on the GLOBAL view,
so semantics are host-count-invariant; XLA inserts the collectives.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np


def host_rows(total_rows: int, process_index: int, process_count: int) -> slice:
    """The contiguous global-row block owned by this host under a plain
    'data'-axis sharding."""
    assert total_rows % process_count == 0, (
        f"global batch {total_rows} not divisible by {process_count} hosts"
    )
    per = total_rows // process_count
    return slice(process_index * per, (process_index + 1) * per)


def host_slice(batch: dict, process_index: int, process_count: int) -> dict:
    sl = host_rows(next(iter(batch.values())).shape[0], process_index, process_count)
    return {k: v[sl] for k, v in batch.items()}


def host_local_batches(global_batches: Iterator[dict], process_index: int,
                       process_count: int) -> Iterator[dict]:
    """Filter a (deterministically seeded) global batch stream down to
    this host's rows. Every host must use the same sampler seed."""
    for b in global_batches:
        yield host_slice(b, process_index, process_count)


def all_gather_case_metrics(local_metric_cal: list[list[tuple[float, float]]]):
    """Gather per-case (dice, hd95) lists from all hosts (the TPU-native
    stand-in for the reference's dead `distributed_all_gather`,
    utils/metrics.py:38-66). Single-process: identity."""
    import jax

    if jax.process_count() == 1:
        return local_metric_cal
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        np.asarray(local_metric_cal, np.float64), tiled=False
    )  # [P, C, cases, 2]
    num_classes = gathered.shape[1]
    return [
        [tuple(row) for proc in gathered for row in proc[c]]
        for c in range(num_classes)
    ]


def make_global_array(local_batch: dict, mesh, spec=None):
    """Assemble per-host local row blocks into one global sharded array
    (DCN scale-out; identity layout on a single host)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, spec if spec is not None else P("data"))
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in local_batch.items()
    }
