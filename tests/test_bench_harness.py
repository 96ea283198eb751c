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


def test_watchdog_emits_contract_json_and_exits():
    import json
    import subprocess
    import sys

    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import time\n"
        "import bench\n"
        "bench._arm_watchdog(0.2, 'unit-test hang')\n"
        "time.sleep(10)\n"
    ) % repo_root
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=60)
    assert r.returncode == 2
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["value"] == 0.0 and rec["error"] == "unit-test hang"
    assert rec["metric"] == "acdc_icl_unet_train_slices_per_sec"


def test_time_family_eval3d_tiny_cpu(monkeypatch):
    import bench

    # shrink the 3D serving volume so the fused sliding window runs in
    # seconds on CPU (the chip bench uses the real 144³ BraTS crop)
    import icl_tpu.eval.infer3d as infer3d

    cfg = ExperimentConfig(
        model="unet_3D", patch_size=(16, 16, 16), batch_size=2,
        labeled_bs=1, num_classes=2, max_iterations=100,
    )
    real_make = infer3d.make_fused_sliding_window

    def small_vol_make(model, num_classes, patch_size, sw_batch=4):
        predict = real_make(model, num_classes, patch_size, sw_batch=sw_batch)

        def predict_small(variables, image, stride_xy=8, stride_z=8):
            return predict(variables, image[:24, :24, :24],
                           stride_xy=8, stride_z=8, bucket=8)

        return predict_small

    monkeypatch.setattr(infer3d, "make_fused_sliding_window", small_vol_make)
    out = bench.time_family(cfg, (2, 16, 16, 16, 1), 2, steps=4, eval_3d=True)
    assert "eval_error" not in out, out.get("eval_error")
    assert out["eval_vol144_sec_p50"] > 0
