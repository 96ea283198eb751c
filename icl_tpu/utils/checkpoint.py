"""Checkpointing.

Two dialects:
  * Full resumable TrainState (params + batch_stats + opt_state + step)
    — msgpack via flax.serialization. The reference has NO resume path
    (the `--resume` flag is parsed but unused, net_factory.py:48); this
    is a deliberate capability addition (SURVEY.md §5).
  * "Best model" export matching the reference contract: params with the
    ICL heads (sspa/uscl) stripped (train_…unet_2D.py:177-181), saved as
    {snapshot}/model/model_best.msgpack.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_pytree(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


def load_pytree(path: str, target: Any = None) -> Any:
    """Load a msgpack pytree; with target=None restores raw nested dicts."""
    with open(path, "rb") as f:
        data = f.read()
    if target is None:
        return serialization.msgpack_restore(data)
    return serialization.from_bytes(target, data)


def merge_trees(base: dict, overlay: dict) -> dict:
    """Recursive overlay: leaves in `overlay` replace those in `base`,
    siblings missing from `overlay` keep their `base` values at every
    depth (NOT just the top level — a checkpoint holding only
    params['encoder']['in_conv'] must not drop the other encoder
    blocks)."""
    out = dict(base)
    for k, v in overlay.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_trees(out[k], v)
        else:
            out[k] = v
    return out


def load_eval_variables(model, ckpt_path: str, example_input):
    """Init a model on its inference path and overlay a (possibly
    ICL-stripped) best checkpoint; missing subtrees keep their fresh init
    (the stripped sspa/uscl heads are unused at inference). Returns
    {'params', 'batch_stats'}."""
    import jax

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        example_input,
        train=False,
        inference=True,
    )
    saved = load_pytree(ckpt_path)
    params = merge_trees(dict(variables["params"]), saved.get("params", {}))
    batch_stats = merge_trees(
        dict(variables.get("batch_stats", {})), saved.get("batch_stats", {})
    )
    return {"params": params, "batch_stats": batch_stats}


def strip_icl_heads(params: dict) -> dict:
    """Drop sspa/uscl subtrees (reference best-ckpt rule)."""
    return {k: v for k, v in params.items() if k not in ("sspa", "uscl")}


def save_best_model(snapshot_path: str, params: dict, batch_stats: dict) -> str:
    path = os.path.join(snapshot_path, "model", "model_best.msgpack")
    # strip BEFORE device_get: for ICL models the dropped heads hold the
    # giant token-MLPs (~99% of bytes)
    save_pytree(
        path,
        jax.device_get(
            {"params": strip_icl_heads(params),
             "batch_stats": strip_icl_heads(batch_stats)}
        ),
    )
    return path


def save_train_state(snapshot_path: str, state, name: str = "last") -> str:
    path = os.path.join(snapshot_path, "model", f"state_{name}.msgpack")
    save_pytree(path, jax.device_get(state))
    return path


def load_train_state(snapshot_path: str, target, name: str = "last"):
    path = os.path.join(snapshot_path, "model", f"state_{name}.msgpack")
    return load_pytree(path, target)


# ---- Orbax backend (optional) ------------------------------------------------
def save_train_state_orbax(snapshot_path: str, state, name: str = "last") -> str:
    """Orbax StandardCheckpointer save — per-leaf files with its own
    integrity metadata; preferable to msgpack for multi-GB states."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(snapshot_path, "model", f"orbax_{name}"))
    ckptr = ocp.StandardCheckpointer()
    import jax

    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return path


def load_train_state_orbax(snapshot_path: str, target, name: str = "last"):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(snapshot_path, "model", f"orbax_{name}"))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=target)


# ---- streaming (overlapped-D2H) checkpoints ----------------------------------
def save_train_state_streaming(snapshot_path: str, state, name: str = "last",
                               chunk_bytes: int = 16 << 20,
                               window: int = 16,
                               cast_dtype: str | None = None) -> str:
    """Full-TrainState save with OVERLAPPED device→host pulls.

    The tunneled D2H path is latency-bound, not bandwidth-bound: serial
    per-buffer pulls read ~4 MB/s while ≥16 concurrent in-flight 16 MB
    chunks sustain ~70–100 MB/s (round-3 measurement on the axon v5e) —
    the difference between a ~35 min and a ~2 min save for the 8.6 GB
    flagship ICL state. Leaves larger than `chunk_bytes` are sliced
    along axis 0 on device; a `window`-deep queue of chunks keeps pulls
    in flight while the host writes (device overhead ≤ window·chunk).

    Layout: `{snapshot}/model/state_{name}.stream/` with `manifest.json`
    (path → file, dtype, shape) + one .npy per leaf. Restore with
    load_train_state_streaming.

    `cast_dtype='bfloat16'` is the LOSSY fallback for slow links: float32
    device leaves (params AND momentum) are cast on device before the
    pull — half the D2H bytes, ~3 significant decimal digits kept. The
    manifest records the original dtype and the loader casts back, so
    restore is transparent (but not bit-exact). Stored as a uint16 view
    (bfloat16 .npy portability)."""
    import json
    from collections import deque

    from flax import serialization, traverse_util

    assert cast_dtype in (None, "bfloat16"), cast_dtype

    def maybe_cast(buf):
        if (cast_dtype and hasattr(buf, "astype")
                and getattr(buf, "dtype", None) == np.float32
                and hasattr(buf, "copy_to_host_async")):
            import jax.numpy as jnp

            return buf.astype(jnp.bfloat16), "float32"
        return buf, None

    sd = serialization.to_state_dict(state)
    # keep_empty_nodes: optax chains carry EmptyState ({}) entries whose
    # positions must survive the round-trip (from_state_dict restores
    # lists by length)
    flat = traverse_util.flatten_dict(sd, sep="/", keep_empty_nodes=True)
    empties = [p for p, v in flat.items() if v is traverse_util.empty_node]
    flat = {p: v for p, v in flat.items()
            if v is not traverse_util.empty_node}
    out_dir = os.path.join(snapshot_path, "model", f"state_{name}.stream")
    os.makedirs(out_dir, exist_ok=True)

    def chunks():
        """(path, row_start|None, row_stop, buffer, orig_dtype|None) —
        leaf-contiguous; cast (if any) happens ON DEVICE per chunk so
        the transient never exceeds chunk_bytes."""
        for path, leaf in flat.items():
            if not hasattr(leaf, "copy_to_host_async"):
                yield (path, None, None, np.asarray(leaf), None)
                continue
            if leaf.ndim == 0 or leaf.nbytes <= chunk_bytes:
                buf, orig = maybe_cast(leaf)
                yield (path, None, None, buf, orig)
                continue
            n0 = leaf.shape[0]
            rows = max(1, int(chunk_bytes * n0 // leaf.nbytes))
            for a in range(0, n0, rows):
                buf, orig = maybe_cast(leaf[a: a + rows])
                yield (path, a, min(a + rows, n0), buf, orig)

    def issue(item):
        buf = item[3]
        if hasattr(buf, "copy_to_host_async"):
            buf.copy_to_host_async()
        queue.append(item)

    queue: deque = deque()
    gen = chunks()
    for _ in range(window):
        nxt = next(gen, None)
        if nxt is None:
            break
        issue(nxt)

    import logging
    import time as _time

    log = logging.getLogger("icl_tpu")
    t_start = _time.perf_counter()
    pulled = 0
    manifest = {}
    partial: dict = {}
    idx = 0
    while queue:
        path, a, b, buf, orig = queue.popleft()
        nxt = next(gen, None)
        if nxt is not None:
            issue(nxt)
        host = np.asarray(buf)
        del buf
        pulled += host.nbytes
        if pulled and pulled % (1 << 30) < host.nbytes:
            dt = _time.perf_counter() - t_start
            log.info("streaming save: %.1f GB pulled, %.0f MB/s",
                     pulled / 2**30, pulled / 2**20 / max(dt, 1e-9))
        leaf_shape = np.shape(flat[path])
        if a is None:
            done, arr = True, host
        else:
            tgt = partial.setdefault(
                path, np.empty(leaf_shape, host.dtype))
            tgt[a:b] = host
            done, arr = (b == leaf_shape[0]), tgt
        if done:
            fname = f"leaf{idx:05d}.npy"
            idx += 1
            rec = {"file": fname, "dtype": str(arr.dtype),
                   "shape": list(arr.shape)}
            if orig is not None:
                # bfloat16 stored as a uint16 view (.npy portability);
                # the loader view()s back and casts to orig_dtype
                rec["orig_dtype"] = orig
                rec["stored_as"] = "uint16"
                arr = arr.view(np.uint16)
            np.save(os.path.join(out_dir, fname), arr)
            manifest[path] = rec
            partial.pop(path, None)

    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"leaves": manifest, "empty_nodes": empties}, f)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return out_dir


def load_train_state_streaming(snapshot_path: str, target, name: str = "last"):
    """Restore a save_train_state_streaming checkpoint into `target`'s
    structure (flax from_state_dict semantics)."""
    import json

    from flax import serialization, traverse_util

    out_dir = os.path.join(snapshot_path, "model", f"state_{name}.stream")
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    # pre-round-3 manifests were a bare path->record map
    records = manifest.get("leaves", manifest)
    empties = manifest.get("empty_nodes", []) if "leaves" in manifest else []
    def load_leaf(rec):
        arr = np.load(os.path.join(out_dir, rec["file"]))
        if rec.get("orig_dtype"):  # lossy bf16-cast save (cast_dtype)
            import ml_dtypes

            arr = arr.view(ml_dtypes.bfloat16).astype(rec["orig_dtype"])
        return arr

    flat = {path: load_leaf(rec) for path, rec in records.items()}
    for p in empties:
        flat[p] = traverse_util.empty_node
    sd = traverse_util.unflatten_dict(flat, sep="/")
    return serialization.from_state_dict(target, sd)


# ---- sharded (multi-process) checkpoints -------------------------------------
def save_train_state_sharded(snapshot_path: str, state, name: str = "last") -> str:
    """Distributed save of a host-SPANNING TrainState (multi-process TP:
    no single process can materialize the model-sharded params). EVERY
    process must call this collectively; Orbax writes each process's
    addressable shards (OCDBT) and rendezvouses over the jax.distributed
    coordination service. The snapshot path must be a filesystem all
    processes can write (shared FS in real multi-host; the same local
    disk in the 2-process test). Pass the LIVE sharded jax.Arrays — no
    device_get."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(
        os.path.join(snapshot_path, "model", f"orbax_sharded_{name}")
    )
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def load_train_state_sharded(snapshot_path: str, target, name: str = "last"):
    """Collective restore of save_train_state_sharded output. `target`
    is a live (or abstract) TrainState whose leaves carry the shardings
    to restore into — each process reads only its shards."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(
        os.path.join(snapshot_path, "model", f"orbax_sharded_{name}")
    )
    def abstractify(x):
        if not hasattr(x, "dtype"):
            return x  # python scalars restore by value
        return jax.ShapeDtypeStruct(
            tuple(getattr(x, "shape", ())), x.dtype,
            sharding=getattr(x, "sharding", None),
        )

    abstract = jax.tree.map(abstractify, target)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=abstract)


# ---- rolling periodic checkpoints --------------------------------------------
def save_train_state_rolling(snapshot_path: str, state, step: int,
                             keep: int = 3,
                             streaming_threshold: int = 1 << 30) -> str:
    """Periodic resumable checkpoint with keep-last-N pruning: saves
    `state_step_{step:08d}.msgpack` and points `state_last.msgpack` at
    the same bytes (hardlink when possible); states at or above
    `streaming_threshold` bytes use the overlapped-D2H streaming dialect
    instead (`state_step_{step:08d}.stream/` + a `state_last.stream`
    symlink) so periodic saves of the multi-GB flagship states run at
    the concurrent-pull rate rather than the ~4 MB/s serial one. Older
    step checkpoints beyond `keep` are deleted (both dialects). `keep=0`
    keeps every step checkpoint (no pruning); negative values are
    rejected. Capability addition over the reference (whose periodic
    save is commented out, train_…unet_2D.py:214-218)."""
    import shutil

    if keep < 0:
        raise ValueError(f"keep must be >= 0, got {keep}")
    model_dir = os.path.join(snapshot_path, "model")
    state_bytes = sum(
        int(np.prod(np.shape(x))) * getattr(x, "dtype", np.dtype("f4")).itemsize
        for x in jax.tree.leaves(state)
    )
    last_msgpack = os.path.join(model_dir, "state_last.msgpack")
    last_stream = os.path.join(model_dir, "state_last.stream")

    def drop(p):
        if os.path.islink(p):
            os.remove(p)
        elif os.path.isdir(p):
            shutil.rmtree(p)
        elif os.path.exists(p):
            os.remove(p)

    if state_bytes >= streaming_threshold:
        path = save_train_state_streaming(
            snapshot_path, state, name=f"step_{step:08d}"
        )
        drop(last_stream)
        drop(last_msgpack)  # stale other-dialect pointer must not win
        os.symlink(os.path.basename(path), last_stream)
    else:
        path = os.path.join(model_dir, f"state_step_{step:08d}.msgpack")
        save_pytree(path, jax.device_get(state))
        drop(last_msgpack)
        drop(last_stream)
        try:
            os.link(path, last_msgpack)
        except OSError:
            shutil.copyfile(path, last_msgpack)
    if keep > 0:
        for old in list_step_checkpoints(snapshot_path)[:-keep]:
            drop(old)
    return path


def _checkpoint_step_of(path: str) -> int:
    import re

    m = re.search(r"state_step_(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else -1


def list_step_checkpoints(snapshot_path: str) -> list:
    """Step-numbered checkpoints (msgpack files and .stream dirs),
    oldest first."""
    import glob

    model_dir = os.path.join(snapshot_path, "model")
    paths = glob.glob(os.path.join(model_dir, "state_step_*.msgpack"))
    paths += glob.glob(os.path.join(model_dir, "state_step_*.stream"))
    return sorted(paths, key=_checkpoint_step_of)


def latest_checkpoint_step(snapshot_path: str) -> int:
    """Step of the newest rolling checkpoint, or -1 if none exist."""
    ckpts = list_step_checkpoints(snapshot_path)
    return _checkpoint_step_of(ckpts[-1]) if ckpts else -1


class AsyncStateSaver:
    """Non-blocking full-TrainState checkpoints via Orbax's
    AsyncCheckpointer: `save` enqueues the device→host pull + write on a
    background thread and returns immediately, so multi-GB saves (8.6 GB
    flagship state at ~7 MB/s over the tunneled D2H path) overlap
    training instead of stalling it. Call `wait()` (or use as a context
    manager) before reading the checkpoint or exiting."""

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, snapshot_path: str, state, name: str = "last") -> str:
        import orbax.checkpoint as ocp

        path = os.path.abspath(
            os.path.join(snapshot_path, "model", f"orbax_{name}")
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self._ckptr.save(
            path, args=ocp.args.StandardSave(jax.device_get(state)), force=True
        )
        return path

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
