import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np, jax
from icl_tpu.config import ExperimentConfig
from icl_tpu.train.trainer import Trainer

out = {}
rng = np.random.default_rng(0)
cfg3 = ExperimentConfig(model="unet_3D_icl", patch_size=(96, 96, 96), batch_size=4,
                        labeled_bs=2, num_classes=2, max_iterations=100,
                        precision="bfloat16")
tr3 = Trainer(cfg3)
state3 = tr3.init_state(jax.random.PRNGKey(0))
variables3 = {"params": state3.params, "batch_stats": state3.batch_stats}
del state3
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
