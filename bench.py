"""Benchmark: ICL 2D U-Net semi-supervised training throughput on the
reference ACDC config (batch 16 = 8 labeled + 8 unlabeled, 256² patches,
SGD+poly — train_inherent_consistent_unet_2D.py:31-49).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value = training slices/sec (batch 16 per step). The reference publishes
no throughput (BASELINE.md); vs_baseline is measured against
BENCH_BASELINE.json — written on the first ever run (self-baseline), so
vs_baseline tracks cumulative speedup across rounds.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# reruns hit the persistent compile cache (first compile of the 1.1B-param
# ICL model is minutes; later runs are seconds)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/icl_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")


def main():
    from icl_tpu.config import ExperimentConfig
    from icl_tpu.train.trainer import Trainer

    batch_size, labeled_bs, patch = 16, 8, 256
    cfg = ExperimentConfig(
        model="icl_unet",
        patch_size=(patch, patch),
        batch_size=batch_size,
        labeled_bs=labeled_bs,
        max_iterations=30000,
        # fast mode: bf16 MXU passes — comparable to the reference's torch
        # 1.9 on A100, where TF32 matmuls/convs are on by default
        precision="bfloat16",
    )
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(batch_size, patch, patch, 1)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 4, size=(batch_size, patch, patch)), jnp.int32),
    }

    # Warmup / compile. NOTE: do NOT pre-split a list of rng keys here —
    # holding ~200 live tiny device buffers alongside the donated multi-GB
    # state makes every step ~40× slower on this runtime (measured:
    # 184ms vs 4.4ms p10). fold_in per step is effectively free.
    step_rng = jax.random.PRNGKey(1)
    state, m = trainer.step_jit(state, batch, step_rng)
    jax.block_until_ready(m["loss"])

    # Per-step blocked timings. Headline = MEDIAN (p50) step latency —
    # the defensible "sustained" statistic; p10/p90 are reported as spread
    # (this tunneled chip oscillates between ~4ms phases and >100ms stall
    # spikes, so the spread is informative).
    # Blocking (one step in flight) costs ~0.1ms and avoids the donated
    # multi-GB-state allocator collapse free-running dispatch can trigger.
    step_times = []
    for i in range(150):
        t0 = time.perf_counter()
        state, m = trainer.step_jit(state, batch, jax.random.fold_in(step_rng, i))
        jax.block_until_ready(m["loss"])
        step_times.append(time.perf_counter() - t0)

    p10, p50, p90 = (float(np.percentile(step_times, q)) for q in (10, 50, 90))
    steps_per_sec = 1.0 / p50
    slices_per_sec = steps_per_sec * batch_size

    STAT = "p50"
    baseline = None
    if os.path.exists(BASELINE_FILE):
        try:
            rec = json.load(open(BASELINE_FILE))
            # re-baseline if the headline statistic changed (r1 used p10)
            if rec.get("stat", "p10") == STAT:
                baseline = rec["value"]
        except Exception:
            baseline = None
    if baseline is None:
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {
                    "metric": "acdc_icl_unet_train_slices_per_sec",
                    "value": slices_per_sec,
                    "stat": STAT,
                    "note": "first-run self baseline on this hardware",
                    "device": str(jax.devices()[0]),
                },
                f,
            )
        baseline = slices_per_sec

    print(
        json.dumps(
            {
                "metric": "acdc_icl_unet_train_slices_per_sec",
                "value": round(slices_per_sec, 3),
                "unit": "slices/sec",
                "vs_baseline": round(slices_per_sec / baseline, 3),
                "stat": "p50 of 150 blocked steps",
                "p10_ms": round(p10 * 1e3, 3),
                "p50_ms": round(p50 * 1e3, 3),
                "p90_ms": round(p90 * 1e3, 3),
                "baseline_is_self": True,
            }
        )
    )


if __name__ == "__main__":
    main()
