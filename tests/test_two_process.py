"""Two-process jax.distributed CPU test (VERDICT r1 item 7): the >1-
process branches of parallel.multihost — make_global_array across two
hosts and all_gather_case_metrics's real process_allgather — produce
the single-process-equivalent results on every host."""
import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_dist_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_gather_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 2-device count
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        # Gloo teardown chatter can share the JSON's line; raw_decode
        # parses the object and ignores the trailing junk
        start = out.index('{"pid"')
        outs.append(json.JSONDecoder().raw_decode(out[start:])[0])

    # the global array semantics are host-count-invariant
    want_sum = float(sum(range(32)))
    want_label_sum = sum(range(8))
    for o in outs:
        assert o["sum"] == want_sum
        assert o["label_sum"] == want_label_sum

    # gather = concatenation over processes per class, identical view on
    # every host (matches what a single process holding all cases sees)
    expected = [
        [[0.0, 10.0], [0.25, 20.0], [1.0, 11.0], [1.25, 21.0]],
        [[0.5, 30.0], [0.75, 40.0], [1.5, 31.0], [1.75, 41.0]],
    ]
    for o in outs:
        assert o["gathered"] == expected, o["gathered"]
