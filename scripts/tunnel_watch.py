"""Tunnel-health watcher (round 5): probe the axon TPU link every few
minutes and, the moment it reads healthy, capture the round's full
evidence set in one go (VERDICT r4 items 1, 3, 4, 5):

  1. full-family bench (`python bench.py`, 2400 s budget) — writes the
     driver-format JSON lines to docs/logs/bench_r5_run<N>.log and
     BENCH_DETAILS.json in-repo (incremental, crash-safe);
  2. if the window is still healthy afterwards, the sustained flagship
     run: 30k iterations at the reference budget
     (train_inherent_consistent_unet_2D.py:31-34) with val_interval 200
     and periodic checkpointing, device-bank + scan8 dispatch —
     docs/logs/sustained_30k_r5.log.

Ops placement: lives in scripts/ (round-4 review: ops tooling was filed
under docs/logs/). Probe discipline per BASELINE.md §round-4: fresh
subprocess, jitted 2048² bf16 matmul, np.asarray fence; healthy < 20 ms
p50 (healthy ~8 ms, degraded 167-1000+ ms).

Usage: python scripts/tunnel_watch.py [max_hours] [--once]
Writes docs/logs/tunnel_watch_r5.log. While a capture is running,
/tmp/icl_bench_running exists — CPU-heavy test jobs should wait.
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "docs", "logs", "tunnel_watch_r5.log")
SENTINEL = "/tmp/icl_bench_running"

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

FIXTURE = r"""
import sys; sys.path.insert(0, %r)
from icl_tpu.data.synth import make_synthetic_acdc
make_synthetic_acdc('/tmp/verify_ACDC', num_slices=96, num_volumes=2,
                    slice_size=256, vol_depth=4, num_classes=4, seed=0)
""" % REPO


def log(msg: str) -> None:
    line = f"{time.strftime('%Y-%m-%d %H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def probe_ms(timeout: float = 600.0) -> float:
    """One fresh-process probe; returns p50 ms or inf on timeout/error."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE], capture_output=True, text=True,
            timeout=timeout, cwd=REPO,
        )
        for tok in out.stdout.split("\n"):
            if tok.startswith("PROBE_P50_MS"):
                return float(tok.split()[1])
        log(f"probe produced no reading (rc={out.returncode}): "
            f"{out.stderr.strip()[-200:]}")
    except subprocess.TimeoutExpired:
        log(f"probe timed out ({timeout:.0f} s)")
    except Exception as e:  # pragma: no cover
        log(f"probe error: {type(e).__name__}: {e}")
    return float("inf")


def run_capture() -> None:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # axon plugin loads via its own hook
    open(SENTINEL, "w").close()
    try:
        # ---- 1. full-family bench ----
        n = 1
        while os.path.exists(os.path.join(
                REPO, "docs", "logs", f"bench_r5_run{n}.log")):
            n += 1
        bench_log = os.path.join(REPO, "docs", "logs", f"bench_r5_run{n}.log")
        env["ICL_TPU_BENCH_TOTAL_BUDGET"] = "2400"
        with open(bench_log, "w") as f:
            rc = subprocess.run(
                [sys.executable, "bench.py"], stdout=f,
                stderr=subprocess.STDOUT, cwd=REPO, env=env, timeout=3600,
            ).returncode
        log(f"bench finished rc={rc} -> {bench_log}")

        # ---- 2. sustained 30k-iteration flagship run ----
        if probe_ms(120) > 20.0:
            log("window degraded after bench — skipping the sustained run")
            return
        if not os.path.isdir("/tmp/verify_ACDC"):
            subprocess.run([sys.executable, "-c", FIXTURE], timeout=600)
        sus_log = os.path.join(REPO, "docs", "logs", "sustained_30k_r5.log")
        log(f"launching sustained 30k run -> {sus_log}")
        with open(sus_log, "w") as f:
            rc = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts",
                              "train_inherent_consistent_unet_2D.py"),
                 "--root_path", "/tmp/verify_ACDC",
                 "--exp", "ACDC_sustained/R5", "--max_iterations", "30000",
                 "--val_interval", "200", "--checkpoint_interval", "10000",
                 "--labeled_num", "3", "--num_tries", "r5",
                 "--input_mode", "device_bank", "--scan_steps", "8"],
                stdout=f, stderr=subprocess.STDOUT, cwd="/tmp", env=env,
                timeout=5400,
            ).returncode
        log(f"sustained run finished rc={rc} -> {sus_log}")
    except subprocess.TimeoutExpired as e:
        log(f"capture step timed out: {e.cmd[:2] if e.cmd else '?'}")
    finally:
        try:
            os.remove(SENTINEL)
        except OSError:
            pass


def main() -> None:
    max_hours = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    deadline = time.time() + max_hours * 3600
    log(f"watch started, deadline in {max_hours} h, healthy < 20 ms p50")
    while time.time() < deadline:
        p50 = probe_ms()
        log(f"probe p50 = {p50} ms")
        if p50 < 20.0:
            log("HEALTHY window — launching capture sequence")
            run_capture()
            log("capture sequence done; artifacts await commit")
            return
        # degraded: sleep out the phase (phases last hours; probe cost is
        # real tunnel traffic, keep it light)
        time.sleep(420)
    log("deadline reached without a healthy window")


if __name__ == "__main__":
    main()
