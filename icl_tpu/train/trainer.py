"""Trainer: one shared train loop replacing the reference's 10
copy-pasted ~250-line scripts (SURVEY.md §7 design translation).

Host loop responsibilities only: feed prefetched batches, log scalars,
run periodic validation, keep the best checkpoint. All compute (forward,
losses, grads, SGD, poly-LR) is one jitted XLA program per step.
"""
from __future__ import annotations

import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from icl_tpu.config import ExperimentConfig
from icl_tpu.models.registry import net_factory
from icl_tpu.train.optim import make_sgd
from icl_tpu.train.state import TrainState
from icl_tpu.train.steps import (
    make_auto_rng_step,
    make_icl_step,
    make_supervised_step,
)
from icl_tpu.utils import checkpoint as ckpt
from icl_tpu.utils.logging_utils import ScalarWriter, setup_logging

ACDC_CLASS_NAMES = ["RV", "Myo", "LV"]  # classes 1..3 (train_…unet_2D.py:190-203)


class _NullWriter:
    """Scalar sink for non-zero processes in multi-process runs."""

    def add_scalar(self, tag, value, step) -> None:
        pass

    def flush(self) -> None:
        pass

    def close(self) -> None:
        pass


class Trainer:
    def __init__(self, cfg: ExperimentConfig, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        if cfg.compile_cache_dir and jax.config.jax_compilation_cache_dir is None:
            # don't override a cache the caller (tests, bench) set up
            import os

            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.expanduser(cfg.compile_cache_dir),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        self.is_icl = cfg.model.startswith("icl_") or cfg.model.endswith("_icl")
        model_kwargs = dict(cfg.model_kwargs)
        if self.is_icl:
            model_kwargs["patch_size"] = int(cfg.patch_size[0])
            if cfg.fuse_icl_pair:
                model_kwargs["fuse_sspa_pair"] = True
        # swinunetr models take block-level remat (the effective form for
        # 3D Swin HBM peaks); other models use step-level remat below.
        model_remat = cfg.remat and cfg.model.startswith("swinunetr")
        if model_remat:
            model_kwargs["remat"] = True
        self.model = net_factory(
            cfg.model, in_chns=cfg.in_chns, class_num=cfg.num_classes, **model_kwargs
        )
        self.tx = make_sgd(
            cfg.base_lr, cfg.max_iterations, cfg.momentum, cfg.weight_decay,
            cfg.poly_power, state_dtype=cfg.state_dtype,
        )
        if cfg.grad_accum > 1:
            import optax

            self.tx = optax.MultiSteps(self.tx, every_k_schedule=cfg.grad_accum)
        step_remat = cfg.remat and not model_remat
        if self.is_icl:
            self._step_fn = make_icl_step(
                self.model, self.tx, cfg.num_classes, cfg.labeled_bs,
                cfg.patch_size, cfg.consis_weight, cfg.pse_weight,
                remat=step_remat,
            )
        else:
            self._step_fn = make_supervised_step(
                self.model, self.tx, cfg.num_classes, seg_weight=cfg.seg_weight,
                remat=step_remat,
            )
        if cfg.device_augment:
            assert len(cfg.patch_size) == 2, "device_augment is 2D-only"
            from icl_tpu.data.device_augment import augment_batch

            inner_aug = self._step_fn
            patch = int(cfg.patch_size[0])

            def _aug_step(state, batch, rng):
                # Two input forms, both augmented on the VPU inside this
                # XLA program:
                #  * {'image' [B,S,S], 'label' [B,S,S]} raw slices
                #    (data.pipeline.acdc_raw_batches), or
                #  * {'image_bank' [N,S,S], 'label_bank' [N,S,S],
                #    'indices' [B]} device-resident bank + index gather
                #    (data.device_bank — zero per-step H2D).
                rng_aug, rng_step = jax.random.split(rng)
                if "indices" in batch:
                    img = batch["image_bank"][batch["indices"]].astype(jnp.float32)
                    lab = batch["label_bank"][batch["indices"]]
                else:
                    img = batch["image"]
                    if img.ndim == 4:
                        img = img[..., 0]
                    lab = batch["label"]
                img, lab = augment_batch(img, lab, rng_aug, patch)
                return inner_aug(state, {"image": img, "label": lab}, rng_step)

            self._step_fn = _aug_step

        # precision='float32' forces exact f32 matmuls/convs (parity mode);
        # the default lets XLA use fast bf16 passes on the MXU (perf mode).
        if cfg.precision == "float32":
            inner = self._step_fn

            def _fp32_step(state, batch, rng):
                with jax.default_matmul_precision("highest"):
                    return inner(state, batch, rng)

            self._step_fn = _fp32_step
        self.step_jit = jax.jit(self._step_fn, donate_argnums=(0,))

        # Auto-RNG step: per-step key derived INSIDE the XLA program
        # from (base key, state.step) — see steps.make_auto_rng_step
        self.step_auto = make_auto_rng_step(self._step_fn)
        self._scan_cache: dict[int, Callable] = {}

    # ------------------------------------------------------------------
    def scan_step(self, k: int) -> Callable:
        """Jitted program running `k` consecutive train steps via
        lax.scan — one host dispatch per k steps. Signature:
        (state, const_batch, var_batches, base_rng) -> (state, metrics)
        where `var_batches` leaves are stacked [k, ...] per-step inputs,
        `const_batch` holds step-invariant arrays (e.g. the HBM-resident
        image/label banks of data.device_bank), and metrics leaves come
        back stacked [k]. Per-step RNG = fold_in(base_rng, state.step),
        identical to step_auto's — scan(k) ≡ k dispatched steps."""
        if k not in self._scan_cache:
            step_fn = self._step_fn

            def scan_fn(state, const_batch, var_batches, base_rng):
                def body(st, vb):
                    b = {**const_batch, **vb}
                    st, m = step_fn(
                        st, b, jax.random.fold_in(base_rng, st.step)
                    )
                    return st, m

                return jax.lax.scan(body, state, var_batches)

            self._scan_cache[k] = jax.jit(scan_fn, donate_argnums=(0,))
        return self._scan_cache[k]

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array) -> TrainState:
        cfg = self.cfg
        spatial = tuple(cfg.patch_size)  # 2D (H, W) or 3D (D, H, W)
        p_rng, d_rng = jax.random.split(rng)
        rngs = {"params": p_rng, "dropout": d_rng}
        if self.is_icl:
            xl = jnp.zeros((cfg.labeled_bs, *spatial, cfg.in_chns), jnp.float32)
            xu = jnp.zeros(
                (cfg.batch_size - cfg.labeled_bs, *spatial, cfg.in_chns), jnp.float32
            )
            variables = self.model.init(rngs, xl, xu, train=True)
        else:
            x = jnp.zeros((cfg.batch_size, *spatial, cfg.in_chns), jnp.float32)
            variables = self.model.init(rngs, x, train=True)
        params = variables["params"]
        if cfg.state_dtype == "bfloat16":
            # bf16 param storage (momentum follows via tx.init); BN
            # batch_stats stay f32 — they are tiny and their running-
            # average precision matters (docs/ROOFLINE.md §4)
            params = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if jnp.issubdtype(p.dtype, jnp.floating) else p,
                params,
            )
        state = TrainState.create(
            params, variables.get("batch_stats", {}), self.tx
        )
        if self.mesh is not None:
            from icl_tpu.parallel.mesh import shard_state

            state = shard_state(state, self.mesh)
        return state

    def restore_state(self, state: TrainState, name: str = "last") -> TrainState:
        """Resume from a periodic full-state checkpoint (fit() continues
        from state.step). Elastic-recovery capability the reference
        lacks (SURVEY.md §5). Reads either the msgpack or the streaming
        (.stream directory) dialect, whichever exists."""
        import os

        snap = self.cfg.snapshot_path
        msgpack = os.path.join(snap, "model", f"state_{name}.msgpack")
        if os.path.exists(msgpack):
            return ckpt.load_train_state(snap, state, name=name)
        if os.path.isdir(os.path.join(snap, "model", f"state_{name}.stream")):
            return ckpt.load_train_state_streaming(snap, state, name=name)
        if os.path.isdir(
            os.path.join(snap, "model", f"orbax_sharded_{name}")
        ):
            # collective restore of a multi-process sharded save: `state`
            # must already carry the target shardings (init_state under
            # the same mesh)
            return ckpt.load_train_state_sharded(snap, state, name=name)
        return ckpt.load_train_state(snap, state, name=name)

    # ------------------------------------------------------------------
    def fit(
        self,
        state: TrainState,
        train_batches: Iterator[dict],
        evaluate: Optional[Callable[[dict], dict]] = None,
        class_names: Optional[list[str]] = None,
    ) -> TrainState:
        """Run cfg.max_iterations steps. `evaluate(variables)` is called
        every cfg.val_interval steps and returns the metric aggregate of
        icl_tpu.metrics.aggregate_case_metrics."""
        cfg = self.cfg
        snapshot = cfg.snapshot_path
        # multi-process: only process 0 touches the snapshot dir (logs,
        # TB scalars, checkpoints); params are replicated under DP so
        # every process computes identical state (SURVEY §7 step 7)
        is_main = jax.process_index() == 0
        if is_main:
            logger = setup_logging(snapshot)
            writer = ScalarWriter(snapshot + "/log")
        else:
            import logging as _logging

            logger = _logging.getLogger("icl_tpu")
            writer = _NullWriter()
        base_rng = jax.random.PRNGKey(cfg.seed)

        if class_names is None:
            class_names = (
                ACDC_CLASS_NAMES
                if cfg.num_classes == 4
                else [str(i) for i in range(1, cfg.num_classes)]
            )

        best_performance = 0.0
        iter_num = int(jax.device_get(state.step))
        if iter_num:
            logger.info("resuming from iteration %d", iter_num)
        t_start = time.perf_counter()
        from icl_tpu.train.optim import poly_lr_schedule

        lr_sched = poly_lr_schedule(cfg.base_lr, cfg.max_iterations, cfg.poly_power)

        def to_device(batch):
            if "indices" in batch:
                db = dict(batch)
                db["indices"] = jnp.asarray(batch["indices"], jnp.int32)
                return db
            if isinstance(batch["image"], jax.Array):
                return batch  # already device-put by the pipeline
            return {
                "image": jnp.asarray(batch["image"], jnp.float32),
                # stable dtypes keep compile-cache keys stable across
                # pipelines (uint8 labels would re-specialize)
                "label": jnp.asarray(batch["label"], jnp.int32),
            }

        # step-invariant leaves under cfg.scan_steps>1 (HBM-resident
        # dataset banks are the same arrays every step — scanning over
        # them would K-fold copy them)
        CONST_KEYS = ("image_bank", "label_bank")
        scan_k = max(1, int(cfg.scan_steps))
        if scan_k > 1 and jax.process_count() > 1:
            # host-side jnp.stack can't build the [k, ...] leaves from
            # non-addressable global arrays; per-step dispatch instead
            logger.info("scan_steps>1 unsupported under multi-process; "
                        "falling back to per-step dispatch")
            scan_k = 1
        batch_iter = iter(train_batches)

        # Deferred scalar logging: the D2H pull of group i's metrics is
        # issued AFTER group i+1 is dispatched, so the tunnel roundtrip
        # (~0.3 s on this runtime — it dominated the end-to-end loop in
        # round 4's verify run: 2.7 it/s with eager per-leaf pulls)
        # overlaps device compute instead of serializing with it. Under
        # cfg.dispatch_depth>1 the backlog deepens to `depth` groups so
        # the pull never fences the pipeline's newest dispatches.
        pending_log: list = []
        depth = max(1, int(cfg.dispatch_depth))
        inflight: list = []  # loss handles of dispatched, un-fenced groups
        analytic_flops = None  # counted once after the first dispatch

        def flush_log():
            if not pending_log:
                return
            b, n2, mets = pending_log.pop(0)
            if not any((b + r + 1) % cfg.log_interval == 0 for r in range(n2)):
                return
            host_rows = jax.device_get(mets)  # ONE batched transfer
            for r in range(n2):
                it = b + r + 1
                if it % cfg.log_interval:
                    continue
                writer.add_scalar("Info/lr", float(lr_sched(it - 1)), it)
                host_metrics = {
                    k2: float(v[r]) if n2 > 1 else float(v)
                    for k2, v in host_rows.items()
                }
                for tag, v in host_metrics.items():
                    writer.add_scalar(f"Loss/{tag}", v, it)
                logger.info(
                    "iteration %d : "
                    + ", ".join(f"{k2}: {v:f}" for k2, v in host_metrics.items()),
                    it,
                )

        running = True
        while running and iter_num < cfg.max_iterations:
            # group size: never scan across a validation / checkpoint /
            # end boundary, and clamp on val_interval on EVERY process
            # (uniform dispatch count across processes under SPMD)
            k = cfg.max_iterations - iter_num
            if cfg.val_interval:
                k = min(k, cfg.val_interval - iter_num % cfg.val_interval)
            if cfg.checkpoint_interval:
                k = min(
                    k, cfg.checkpoint_interval - iter_num % cfg.checkpoint_interval
                )
            k = min(k, scan_k)
            group = []
            for _ in range(k):
                try:
                    group.append(to_device(next(batch_iter)))
                except StopIteration:
                    running = False
                    break
            if not group:
                break
            n = len(group)
            if n == 1:
                state, metrics = self.step_auto(state, group[0], base_rng)
            else:
                const = {c: group[0][c] for c in CONST_KEYS if c in group[0]}
                # the const leaves must be literally step-invariant — a
                # pipeline that rebuilds its banks per batch would train
                # steps 2..k on batch 0's stale bank without this check
                assert all(g[c] is const[c] for g in group for c in const), (
                    "scan_steps>1 requires identical bank arrays across "
                    "the group (data.device_bank contract)"
                )
                var = [
                    {c: v for c, v in g.items() if c not in const} for g in group
                ]
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *var)
                state, metrics = self.scan_step(n)(state, const, stacked, base_rng)
            base_iter = iter_num
            iter_num += n
            if analytic_flops is None and cfg.log_flops:
                # one-time host-side jaxpr walk (utils/flops.py): runs
                # while the device chews the just-dispatched first group,
                # so it costs no step time. 0.0 marks "tried, unavailable".
                try:
                    from icl_tpu.utils.flops import analytic_step_flops

                    analytic_flops = analytic_step_flops(
                        self.step_auto, state, group[0], base_rng
                    )
                    logger.info(
                        "analytic step cost: %.1f GFLOP (2MNK dot + conv "
                        "jaxpr walk, incl. remat recompute)",
                        analytic_flops / 1e9,
                    )
                except Exception:
                    analytic_flops = 0.0
            pending_log.append((base_iter, n, metrics))
            # Metrics transfers of groups that left the pipeline window
            # overlap the in-flight groups' device compute (the arrays
            # are complete; only the tunnel roundtrip remains).
            while len(pending_log) > depth:
                flush_log()
            # Bound the dispatch pipeline at cfg.dispatch_depth groups in
            # flight: free-running dispatch with donated multi-GB states
            # can collapse the allocator on this hardware (see bench.py);
            # at the default depth=1 this is the round-3 blocked stepping,
            # at depth>1 the per-dispatch tunnel RTT amortizes across the
            # window (bench.py pipe* mode measures exactly this).
            inflight.append(metrics["loss"])
            if len(inflight) >= depth:
                jax.block_until_ready(inflight.pop(0))

            if (evaluate is not None and is_main and cfg.val_interval
                    and iter_num % cfg.val_interval == 0):
                while pending_log:  # keep log.txt ordering exact at boundaries
                    flush_log()
                # keep params on device for the jitted predictors; only the
                # (ICL-stripped) best-checkpoint save pulls to host
                variables = {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                }
                if jax.process_count() > 1:
                    # predictors jit on THIS host's devices only; global
                    # (mesh-spanning) param arrays would require SPMD
                    # participation from every process. Under DP the
                    # params are replicated — pull local copies.
                    from icl_tpu.parallel.multihost import state_host_readable

                    if not state_host_readable(variables):
                        logger.warning(
                            "skipping validation at iter %d: params span "
                            "hosts (multi-process TP); evaluate offline",
                            iter_num,
                        )
                        variables = None
                    else:
                        variables = jax.device_get(variables)
                agg = evaluate(variables) if variables is not None else None
                if agg is not None:
                    writer.add_scalar("metric_all/mean_dice", agg["mean_dice"], iter_num)
                    writer.add_scalar("metric_all/mean_hd95", agg["mean_hd95"], iter_num)
                    writer.add_scalar("metric_all/std_dice", agg["std_dice"], iter_num)
                    writer.add_scalar("metric_all/std_hd95", agg["std_hd95"], iter_num)
                    for ci, name in enumerate(class_names):
                        writer.add_scalar(
                            f"metric_class_{name}/mean_dice", agg["class_mean"][ci][0], iter_num
                        )
                        writer.add_scalar(
                            f"metric_class_{name}/mean_hd95", agg["class_mean"][ci][1], iter_num
                        )
                    logger.info(
                        "iteration %d : mean_dice : %f  mean_hd95 : %f",
                        iter_num, agg["mean_dice"], agg["mean_hd95"],
                    )
                    if agg["mean_dice"] > best_performance:
                        best_performance = agg["mean_dice"]
                        # reference contract: ICL heads stripped — for ICL
                        # models this drops ~99% of the bytes (the token-MLPs)
                        path = ckpt.save_best_model(
                            snapshot, variables["params"], variables["batch_stats"]
                        )
                        logger.info("saving best model at iter %d -> %s", iter_num, path)

            if (is_main and cfg.checkpoint_interval
                    and iter_num % cfg.checkpoint_interval == 0):
                while pending_log:
                    flush_log()
                path = ckpt.save_train_state_rolling(
                    snapshot, state, iter_num, keep=cfg.keep_checkpoints
                )
                logger.info("periodic checkpoint at iter %d -> %s", iter_num, path)

        # drain the dispatch pipeline BEFORE reading the clock: with
        # dispatch_depth>1 up to depth-1 groups are still executing, and
        # flush_log without a matching log_interval row performs no
        # device_get — the finished-summary it/s would over-report the
        # tail (ADVICE r4)
        if inflight:
            jax.block_until_ready(inflight)
            inflight.clear()
        while pending_log:
            flush_log()
        elapsed = time.perf_counter() - t_start
        if analytic_flops:
            # end-to-end rate: includes compile + validation + logging,
            # so it lower-bounds the steady-state TFLOP/s (bench.py
            # measures the steady state; this line is the in-run
            # observability cross-check, SURVEY §5 profiling)
            logger.info(
                "Training finished: %d iters in %.1fs (%.2f it/s, "
                "end-to-end analytic %.2f TFLOP/s at %.1f GFLOP/step)",
                iter_num, elapsed, iter_num / max(elapsed, 1e-9),
                analytic_flops * iter_num / max(elapsed, 1e-9) / 1e12,
                analytic_flops / 1e9,
            )
        else:
            logger.info(
                "Training finished: %d iters in %.1fs (%.2f it/s)",
                iter_num, elapsed, iter_num / max(elapsed, 1e-9),
            )
        state_bytes = sum(
            int(np.prod(x.shape)) * x.dtype.itemsize for x in jax.tree.leaves(state)
        )
        from icl_tpu.parallel.multihost import state_host_readable

        if not state_host_readable(state):
            # model axis spans hosts: no process can materialize the
            # full state — COLLECTIVE sharded Orbax save instead (every
            # process writes its addressable shards; snapshot dir must
            # be a shared filesystem)
            t0 = time.perf_counter()
            path = ckpt.save_train_state_sharded(snapshot, state, name="last")
            if is_main:
                logger.info(
                    "final sharded save (state spans hosts): %.1f GB in "
                    "%.1fs -> %s",
                    state_bytes / 2**30, time.perf_counter() - t0, path,
                )
        elif not is_main:
            pass  # process 0 owns all snapshot writes
        elif state_bytes < (1 << 30):
            ckpt.save_train_state(snapshot, state, name="last")
        else:
            # Multi-GB states: overlapped-D2H streaming save (~70-100
            # MB/s on the tunneled chip vs ~4 MB/s for a serial pull —
            # utils/checkpoint.save_train_state_streaming).
            t0 = time.perf_counter()
            path = ckpt.save_train_state_streaming(snapshot, state, name="last")
            dt = time.perf_counter() - t0
            logger.info(
                "final full-state save: %.1f GB in %.1fs (%.0f MB/s) -> %s",
                state_bytes / 2**30, dt, state_bytes / 2**20 / max(dt, 1e-9),
                path,
            )
        writer.close()
        return state
