"""bench.py harness plumbing on a tiny CPU config: the per-step timing,
scan-fused timing, cost-analysis, and serving-path sections must all
produce their keys (the driver's end-of-round bench runs this exact
code on the chip at the flagship config — a plumbing break there costs
the round's BENCH artifact)."""
import numpy as np

from icl_tpu.config import ExperimentConfig


def test_time_family_keys_tiny_cpu():
    import bench

    cfg = ExperimentConfig(
        model="unet", patch_size=(16, 16), batch_size=4, labeled_bs=2,
        max_iterations=100,
    )
    out = bench.time_family(cfg, (4, 16, 16, 1), 4, steps=6, scan_k=2,
                            eval_2d=True)
    assert out["steps_per_sec_p50"] > 0
    assert out["p10_ms"] <= out["p50_ms"] <= out["p90_ms"]
    assert out["steps_per_sec_wall"] > 0
    assert "scan2_error" not in out, out.get("scan2_error")
    assert out["scan2_steps_per_sec_p50"] > 0
    assert "eval_error" not in out, out.get("eval_error")
    assert out["eval_slices_per_sec_p50"] > 0
    # flops key is optional (backend-dependent) but must be numeric if set
    if "xla_cost_flops_per_step" in out:
        assert np.isfinite(out["xla_cost_flops_per_step"])
