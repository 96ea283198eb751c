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


def initialize_from_args(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None):
    """`jax.distributed.initialize` from CLI flags with ICL_TPU_*
    env-var fallbacks (ICL_TPU_COORDINATOR / ICL_TPU_NUM_PROCESSES /
    ICL_TPU_PROCESS_ID). No-op for single-process runs. Returns
    (process_index, process_count). Call BEFORE any jax device query."""
    import os

    import jax

    coordinator = coordinator or os.environ.get("ICL_TPU_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("ICL_TPU_NUM_PROCESSES", "1") or 1)
    if process_id is None:
        process_id = int(os.environ.get("ICL_TPU_PROCESS_ID", "0") or 0)
    if num_processes > 1:
        assert coordinator, "--dist_coordinator (host:port) required when num_processes > 1"
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def multihost_batches(global_batches: Iterator[dict], mesh) -> Iterator[dict]:
    """Turn a deterministically-seeded GLOBAL batch stream into global
    sharded arrays: each host materializes only its contiguous row block
    and the global view is assembled per batch. Single-process: the
    whole batch is local and this is just a device_put with the batch
    sharding."""
    import jax

    pid, pcount = jax.process_index(), jax.process_count()
    for b in global_batches:
        yield make_global_array(host_slice(b, pid, pcount), mesh)


def state_host_readable(state) -> bool:
    """Whether every array leaf of `state` can be pulled to THIS host
    (fully replicated, fully addressable, or not a global jax.Array).
    Under multi-process tensor parallelism model-sharded params span
    hosts and a plain device_get would fail — callers skip/shard the
    save instead."""
    import jax

    for leaf in jax.tree.leaves(state):
        if isinstance(leaf, jax.Array):
            if not (leaf.is_fully_replicated or leaf.is_fully_addressable):
                return False
    return True


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


def launch_batches(global_batches: Iterator[dict], process_count: int):
    """The CLI launch contract in one place (every train script uses
    this): under multi-process, a data-axis mesh over every device on
    every host + `multihost_batches`; single-process, no mesh and a
    threaded `Prefetcher`. Returns (mesh_or_None, batch_iterator) —
    pass the mesh to `Trainer(cfg, mesh=mesh)`."""
    if process_count > 1:
        from icl_tpu.parallel.mesh import create_mesh

        mesh = create_mesh()
        return mesh, multihost_batches(global_batches, mesh)
    from icl_tpu.data.pipeline import Prefetcher

    return None, Prefetcher(global_batches)
