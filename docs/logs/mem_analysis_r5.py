"""Per-family XLA compile-time HBM accounting (VERDICT r4 item 7;
runtime memory_stats() is None on this backend)."""
import sys, json
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from icl_tpu.config import ExperimentConfig
from icl_tpu.train.trainer import Trainer

FAMS = [
    ("icl_unet_acdc", dict(model="icl_unet", patch_size=(256, 256), batch_size=16,
     labeled_bs=8, max_iterations=30000, precision="bfloat16"), (16, 256, 256, 1), 4),
    ("swinunetr_icl_brats", dict(model="swinunetr_icl", patch_size=(96, 96, 96),
     batch_size=4, labeled_bs=2, num_classes=2, max_iterations=30000,
     consis_weight=10.0, remat=True, precision="bfloat16"), (4, 96, 96, 96, 1), 2),
    ("unet_3d_icl_brats", dict(model="unet_3D_icl", patch_size=(96, 96, 96),
     batch_size=4, labeled_bs=2, num_classes=2, max_iterations=30000,
     consis_weight=10.0, precision="bfloat16"), (4, 96, 96, 96, 1), 2),
    ("icl_swinunet_acdc", dict(model="icl_swinunet", patch_size=(224, 224),
     batch_size=16, labeled_bs=8, max_iterations=30000,
     precision="bfloat16"), (16, 224, 224, 1), 4),
    ("icl_unet_acdc_bf16state", dict(model="icl_unet", patch_size=(256, 256),
     batch_size=16, labeled_bs=8, max_iterations=30000, precision="bfloat16",
     state_dtype="bfloat16"), (16, 256, 256, 1), 4),
    ("icl_unet_acdc_fast", dict(model="icl_unet", patch_size=(256, 256),
     batch_size=16, labeled_bs=8, max_iterations=30000, precision="bfloat16",
     state_dtype="bfloat16", fuse_icl_pair=True), (16, 256, 256, 1), 4),
]
out = {}
for name, kw, shape, ncls in FAMS:
    cfg = ExperimentConfig(**kw)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng.normal(size=shape), jnp.float32),
             "label": jnp.asarray(rng.integers(0, ncls, size=shape[:-1]), jnp.int32)}
    ma = tr.step_auto.lower(state, batch, jax.random.PRNGKey(1)).compile().memory_analysis()
    row = {
        "xla_args_gb": round(ma.argument_size_in_bytes / 2**30, 2),
        "xla_temps_gb": round(ma.temp_size_in_bytes / 2**30, 2),
        "xla_outputs_gb": round(ma.output_size_in_bytes / 2**30, 3),
    }
    row["xla_peak_gb"] = round(row["xla_args_gb"] + row["xla_temps_gb"], 2)
    out[name] = row
    print(name, json.dumps(row), flush=True)
    del state, tr, batch
print("FINAL " + json.dumps(out), flush=True)
