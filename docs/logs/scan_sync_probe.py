"""Probe: why does the scan8 group appear to run 8 steps in 3.9 ms?

Compares three sync disciplines per group:
  A) block_until_ready(ms['loss'])            (bench.py's current sync)
  B) jax.block_until_ready(state)             (full output sync)
  C) jax.device_get(ms['loss'])               (host materialization)
and a no-sync enqueue loop with one final sync (wall / n groups).
"""
import os, time
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/icl_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from icl_tpu.config import ExperimentConfig
from icl_tpu.train.trainer import Trainer

cfg = ExperimentConfig(model="icl_unet", patch_size=(256, 256), batch_size=16,
                       labeled_bs=8, max_iterations=30000, precision="bfloat16")
tr = Trainer(cfg)
state = tr.init_state(jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
batch = {"image": jnp.asarray(rng.normal(size=(16, 256, 256, 1)), jnp.float32),
         "label": jnp.asarray(rng.integers(0, 4, size=(16, 256, 256)), jnp.int32)}
base = jax.random.PRNGKey(1)

K = 8
scan_fn = tr.scan_step(K)
stacked = jax.tree.map(lambda x: jnp.stack([x] * K), batch)
t0 = time.time()
state, ms = scan_fn(state, {}, stacked, base)
jax.block_until_ready(ms["loss"])
print(f"compile/cache {time.time()-t0:.1f}s  loss={np.asarray(ms['loss'])}")

def timed(n, sync):
    global state
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        state, ms = scan_fn(state, {}, stacked, base)
        sync(state, ms)
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50)) * 1e3

pA = timed(12, lambda st, m: jax.block_until_ready(m["loss"]))
print(f"A block(loss):        p50 {pA:8.2f} ms/group  {pA/K:6.3f} ms/step", flush=True)
pB = timed(12, lambda st, m: jax.block_until_ready(st))
print(f"B block(state):       p50 {pB:8.2f} ms/group  {pB/K:6.3f} ms/step", flush=True)
pC = timed(12, lambda st, m: np.asarray(m["loss"]))
print(f"C device_get(loss):   p50 {pC:8.2f} ms/group  {pC/K:6.3f} ms/step", flush=True)

# no per-group sync: enqueue 12 groups, one final sync
t0 = time.perf_counter()
for _ in range(12):
    state, ms = scan_fn(state, {}, stacked, base)
jax.block_until_ready(state)
w = (time.perf_counter() - t0) / 12 * 1e3
print(f"D enqueue-only wall:  avg {w:8.2f} ms/group  {w/K:6.3f} ms/step", flush=True)

# per-step dispatch for reference
state2, m2 = tr.step_auto(state, batch, base)
jax.block_until_ready(m2["loss"])
ts = []
for _ in range(30):
    t0 = time.perf_counter()
    state2, m2 = tr.step_auto(state2, batch, base)
    jax.block_until_ready(m2["loss"])
    ts.append(time.perf_counter() - t0)
print(f"E per-step dispatch:  p50 {float(np.percentile(ts,50))*1e3:8.3f} ms/step", flush=True)
