"""Worker for tests/test_two_process.py: one of two jax.distributed
CPU processes exercising make_global_array + the REAL gather branch of
all_gather_case_metrics (VERDICT r1 item 7).

Usage: python _dist_worker.py <process_id> <coordinator_port>
Prints one JSON line with the gathered results for the parent to check.
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

# the container's sitecustomize force-registers the axon TPU backend and
# overrides JAX_PLATFORMS; switch via jax.config (tests/conftest.py note)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icl_tpu.parallel.multihost import (  # noqa: E402
    all_gather_case_metrics,
    host_slice,
    make_global_array,
)


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 virtual CPU devices per process

    from icl_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(data=4, model=1)

    # deterministic global batch on every host; each host materializes
    # only its row block (the multi-host input contract)
    global_batch = {
        "image": np.arange(8 * 4, dtype=np.float32).reshape(8, 4),
        "label": np.arange(8, dtype=np.int32),
    }
    local = host_slice(global_batch, pid, 2)
    garr = make_global_array(local, mesh)
    assert garr["image"].shape == (8, 4)

    total = float(jax.jit(lambda x: x.sum())(garr["image"]))
    label_sum = int(jax.jit(lambda x: x.sum())(garr["label"]))

    # per-host DISTINCT metric lists -> gather must interleave all cases
    local_metrics = [
        [(float(pid), 10.0 + pid), (float(pid) + 0.25, 20.0 + pid)],  # class 1
        [(float(pid) + 0.5, 30.0 + pid), (float(pid) + 0.75, 40.0 + pid)],  # class 2
    ]
    gathered = all_gather_case_metrics(local_metrics)
    gathered = [[[float(v) for v in row] for row in cls] for cls in gathered]

    print(json.dumps({
        "pid": pid,
        "sum": total,
        "label_sum": label_sum,
        "gathered": gathered,
    }), flush=True)


if __name__ == "__main__":
    main()
