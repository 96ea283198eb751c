"""Re-measure the flagship config trio after the SR fix (threefry ->
XLA native RngBitGenerator): control (f32 state) + bf16state + fast."""
import sys, json
sys.path.insert(0, "/root/repo")
import bench
from icl_tpu.config import ExperimentConfig

common = dict(model="icl_unet", patch_size=(256, 256), batch_size=16,
              labeled_bs=8, max_iterations=30000, precision="bfloat16")
rows = [
    ("control_f32state", ExperimentConfig(**common)),
    ("bf16state_fixedSR", ExperimentConfig(**common, state_dtype="bfloat16")),
    ("fast_fixedSR", ExperimentConfig(**common, state_dtype="bfloat16",
                                      fuse_icl_pair=True)),
]
out = {}
for name, cfg in rows:
    r = bench.time_family(cfg, (16, 256, 256, 1), 4, steps=50)
    out[name] = {k: r[k] for k in ("p10_ms", "p50_ms", "p90_ms",
                                   "steps_per_sec_p50") if k in r}
    for k in ("hbm_peak_gb", "analytic_flops_per_step", "bytes_floor_ms",
              "state_gb"):
        if k in r:
            out[name][k] = r[k]
    print(name, json.dumps(out[name]), flush=True)
print("FINAL " + json.dumps(out), flush=True)
