"""Degraded-window serving comparison (VERDICT r4 item 5 insurance):
absolute numbers need a healthy tunnel, but the RELATIVE win of the
batched/fused serving paths over the reference's per-slice/per-patch
round-trip structure is measurable in any window (round-4 diagnosis:
degradation is device-side pacing — both paths slow together)."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from icl_tpu.config import ExperimentConfig
from icl_tpu.train.trainer import Trainer

out = {}
rng = np.random.default_rng(0)

# ---- 2D: batched slice predictor vs per-slice round-trip ----
cfg = ExperimentConfig(model="icl_unet", patch_size=(256, 256), batch_size=16,
                       labeled_bs=8, max_iterations=100, precision="bfloat16")
tr = Trainer(cfg)
state = tr.init_state(jax.random.PRNGKey(0))
variables = {"params": state.params, "batch_stats": state.batch_stats}
from icl_tpu.eval.infer2d import make_slice_predictor
predict = make_slice_predictor(tr.model, cfg.patch_size)
vol = rng.normal(size=(64, 256, 256)).astype(np.float32)
predict(variables, vol)
ts = []
for _ in range(5):
    t0 = time.perf_counter(); predict(variables, vol); ts.append(time.perf_counter() - t0)
p50 = float(np.percentile(ts, 50))
out["eval2d_batched_slices_per_sec_p50"] = round(64 / p50, 2)

model = tr.model
@jax.jit
def _fwd1(variables, x):
    logits = model.apply(variables, x, train=False, inference=True)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
np.asarray(_fwd1(variables, jnp.asarray(vol[0][None, ..., None])))
t0 = time.perf_counter()
n_ref = 16
for d in range(n_ref):
    x = jnp.asarray(vol[d][None, ..., None])
    np.asarray(_fwd1(variables, x))
ref_s = time.perf_counter() - t0
out["eval2d_refpattern_slices_per_sec"] = round(n_ref / ref_s, 2)
out["eval2d_batched_over_refpattern"] = round(
    out["eval2d_batched_slices_per_sec_p50"] / out["eval2d_refpattern_slices_per_sec"], 2)
print(json.dumps(out), flush=True)

# ---- 3D: fused sliding window vs host-chunked ----
cfg3 = ExperimentConfig(model="unet_3D_icl", patch_size=(96, 96, 96), batch_size=4,
                        labeled_bs=2, num_classes=2, max_iterations=100,
                        precision="bfloat16")
tr3 = Trainer(cfg3)
state3 = tr3.init_state(jax.random.PRNGKey(0))
variables3 = {"params": state3.params, "batch_stats": state3.batch_stats}
from icl_tpu.eval.infer3d import (make_fused_sliding_window,
                                  make_patch_predictor, sliding_window_predict)
predict3 = make_fused_sliding_window(tr3.model, 2, cfg3.patch_size, sw_batch=4)
vol3 = rng.normal(size=(144, 144, 144)).astype(np.float32)
predict3(variables3, vol3)
ts = []
for _ in range(3):
    t0 = time.perf_counter(); predict3(variables3, vol3); ts.append(time.perf_counter() - t0)
out["eval3d_fused_vol144_sec_p50"] = round(float(np.percentile(ts, 50)), 3)
probs_fn = make_patch_predictor(tr3.model, cfg3.patch_size, sw_batch=4)
sliding_window_predict(probs_fn, variables3, vol3, 2, cfg3.patch_size,
                       stride_xy=64, stride_z=64)
t0 = time.perf_counter()
sliding_window_predict(probs_fn, variables3, vol3, 2, cfg3.patch_size,
                       stride_xy=64, stride_z=64)
out["eval3d_hostchunk_vol144_sec"] = round(time.perf_counter() - t0, 3)
out["eval3d_hostchunk_over_fused"] = round(
    out["eval3d_hostchunk_vol144_sec"] / out["eval3d_fused_vol144_sec_p50"], 2)
print(json.dumps(out), flush=True)
