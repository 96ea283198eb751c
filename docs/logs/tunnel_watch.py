"""Tunnel-health watcher: probe the axon TPU link every few minutes and,
the moment it reads healthy, fire the full-family bench (VERDICT r3
item 2 — the one round-4 deliverable still blocked on tunnel phase).

Each probe is a fresh subprocess (jax state can't be re-initialised
in-process) timing a jitted 2048^2 bf16 matmul with an np.asarray
fence — the same discipline as BASELINE.md round-4. Healthy threshold:
p50 < 20 ms (healthy windows read ~8 ms; degraded 167-394 ms).

Usage: python docs/logs/tunnel_watch.py [max_hours]
Writes docs/logs/tunnel_watch.log; on a healthy probe runs
`python bench.py` (all families, 2400 s budget) capturing
docs/logs/bench_r4_run4.log and exits.
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
LOG = os.path.join(REPO, "docs", "logs", "tunnel_watch.log")
BENCH_LOG = os.path.join(REPO, "docs", "logs", "bench_r4_run4.log")

PROBE = r"""
import time, numpy as np, jax, jax.numpy as jnp
x = jnp.ones((2048, 2048), jnp.bfloat16)
f = jax.jit(lambda a: a @ a)
np.asarray(f(x))
ts = []
for _ in range(7):
    t0 = time.perf_counter(); np.asarray(f(x)); ts.append(time.perf_counter() - t0)
print("PROBE_P50_MS", round(float(np.percentile(ts, 50)) * 1e3, 2))
"""


def log(msg: str) -> None:
    line = f"{time.strftime('%Y-%m-%d %H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def probe_ms() -> float:
    """One fresh-process probe; returns p50 ms or inf on timeout/error."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE], capture_output=True, text=True,
            timeout=600, cwd=REPO,
        )
        for tok in out.stdout.split("\n"):
            if tok.startswith("PROBE_P50_MS"):
                return float(tok.split()[1])
        log(f"probe produced no reading (rc={out.returncode}): "
            f"{out.stderr.strip()[-200:]}")
    except subprocess.TimeoutExpired:
        log("probe timed out (600 s)")
    except Exception as e:  # pragma: no cover
        log(f"probe error: {type(e).__name__}: {e}")
    return float("inf")


def main() -> None:
    max_hours = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    deadline = time.time() + max_hours * 3600
    log(f"watch started, deadline in {max_hours} h, healthy < 20 ms p50")
    while time.time() < deadline:
        p50 = probe_ms()
        log(f"probe p50 = {p50} ms")
        if p50 < 20.0:
            log("HEALTHY window — launching full-family bench")
            env = dict(os.environ)
            env.pop("PYTHONPATH", None)  # axon plugin loads via its own hook
            env["ICL_TPU_BENCH_TOTAL_BUDGET"] = "2400"
            with open(BENCH_LOG, "w") as f:
                rc = subprocess.run(
                    [sys.executable, "bench.py"], stdout=f,
                    stderr=subprocess.STDOUT, cwd=REPO, env=env,
                    timeout=3600,
                ).returncode
            log(f"bench finished rc={rc} -> {BENCH_LOG}")
            return
        # degraded: sleep out the phase (phases last hours; probe cost is
        # real tunnel traffic, keep it light)
        time.sleep(420)
    log("deadline reached without a healthy window")


if __name__ == "__main__":
    main()
