"""Benchmark: ICL training throughput per family on the reference
configs. Flagship = ICL 2D U-Net on ACDC (batch 16 = 8 labeled + 8
unlabeled, 256² patches, SGD+poly — train_inherent_consistent_unet_2D.py
:31-49); secondary families = icl_swinunet 2D @224², unet_3D_icl +
swinunetr_icl BraTS @96³ bs4.

Driver contract & crash-safety (VERDICT r3 item 1): the flagship JSON
line is printed AND FLUSHED the moment the flagship measurement exists —
before any secondary family compiles — so a mid-run kill can no longer
cost the round its BENCH artifact. Secondary families run under a hard
wall budget (ICL_TPU_BENCH_TOTAL_BUDGET, default 900 s): each family is
skipped-with-note when the remaining budget can't cover its estimate.
When families complete, ONE final enriched JSON line repeats the exact
same headline fields plus a "families" dict (whichever line the driver
parses carries the same flagship numbers), and the full detail also
lands in BENCH_DETAILS.json for BASELINE.md citation.

The reference publishes no throughput (BASELINE.md); vs_baseline is
measured against BENCH_BASELINE.json — written on the first ever run
(self-baseline), so vs_baseline tracks cumulative speedup across rounds.
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
DETAILS_FILE = os.path.join(os.path.dirname(__file__), "BENCH_DETAILS.json")
T0 = time.time()
BUDGET = float(os.environ.get("ICL_TPU_BENCH_TOTAL_BUDGET", "900"))
# bf16 peak of the target chip (v5e: 197 TFLOP/s) — the roofline guard
# below refuses to promote any number that implies >105% of this.
PEAK_TFLOPS = float(os.environ.get("ICL_TPU_PEAK_TFLOPS", "197"))
# set once any real artifact line has been printed: the watchdog then
# never overwrites it with a zero line
ARTIFACT_OUT = {"yes": False}
# filled by micro_roofline() at the start of main(): empirical peaks
# used for the two-sided sanity guards (FLOPs roofline + bytes floor)
ROOFLINE: dict = {}
# once the flagship line is out, main() installs a finalizer here; a
# firing watchdog runs it (prints the enriched final line with every
# remaining family marked skipped) and exits 0 — a run that produced a
# good flagship artifact is structurally incapable of rc≠0 (round-4
# failure mode: the re-armed watchdog fired os._exit(2) mid-secondary
# and the driver recorded rc=2 with 2 of 4 family rows missing).
FINALIZE = {"fn": None}


def _sync(metrics) -> None:
    """Materialize the step's loss bytes ON HOST (device_get) as the
    timing fence. Round-4 finding: `block_until_ready` on this tunneled
    runtime can report completion early in some phases — one bench
    window read a scan8 group of 8×852-GFLOP steps in 3.9 ms (1.75
    PFLOP/s on a 197 TFLOP/s chip, physically impossible), while
    device_get/-state syncs in the same session agreed with each other
    and with enqueue-only wall clocks. Host-materialized bytes cannot
    lie; the extra scalar D2H is one tunnel RTT, amortized for scans."""
    np.asarray(metrics["loss"])


def remaining() -> float:
    return BUDGET - (time.time() - T0)


def micro_roofline(reps: int = 3, n: int = 1 << 28, m: int = 4096,
                   k_bw: int = 10, k_mm: int = 32) -> dict:
    """Empirical chip peaks, ~20 s: (a) achievable HBM bandwidth via a
    chained elementwise update over a 1 GiB f32 buffer (20 GiB of
    read+write traffic per dispatch, one device_get fence), (b)
    achievable bf16 matmul TFLOP/s via 32 chained 4096² matmuls in one
    dispatch (4.4 TFLOP). These are the DENOMINATORS the round-5
    roofline analysis uses: the flagship train step moves ~2× its
    8.55 GB state per step (SGD+momentum reads/writes every param), so
    its speed-of-light is bytes/BW, not FLOPs/peak — any step reading
    faster than the measured-BW floor is a measurement artifact
    (docs/ROOFLINE.md)."""
    import jax.lax as lax

    out = {}
    try:
        @jax.jit
        def bw_chain(x):
            # roll keeps each iteration a real 1 GiB read + 1 GiB write
            # even if XLA unrolls the counted loop (a pure elementwise
            # body could otherwise fuse across iterations into one pass)
            return lax.fori_loop(
                0, k_bw, lambda i, a: jnp.roll(a, 1) * 1.0000001 + 1e-7, x)

        x = jnp.zeros((n,), jnp.float32)
        np.asarray(bw_chain(x)[:1])  # compile + warmup
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(bw_chain(x)[:1])
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        traffic = 2.0 * 4 * n * k_bw  # read + write per iteration
        out["measured_hbm_gbs"] = round(traffic / best / 1e9, 3)
        out["hbm_probe_s"] = [round(t, 4) for t in ts]
    except Exception as e:  # pragma: no cover - device-specific
        out["hbm_probe_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        @jax.jit
        def mm_chain(a):
            return lax.fori_loop(
                0, k_mm, lambda i, x: (x @ x) * (1.0 / m), a)

        a = jnp.full((m, m), 1.0, jnp.bfloat16)
        np.asarray(mm_chain(a)[:1, :1])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(mm_chain(a)[:1, :1])
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        flops = 2.0 * m**3 * k_mm
        out["measured_mxu_tflops"] = round(flops / best / 1e12, 4)
        out["mxu_probe_s"] = [round(t, 4) for t in ts]
    except Exception as e:  # pragma: no cover - device-specific
        out["mxu_probe_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def _measure_scan(trainer, state, batch, base_rng, k: int, steps: int,
                  out: dict, flops_num, n_groups: int = 0):
    """Time k-step scan groups (ONE dispatch per group, device_get fence
    on the k host-materialized losses); writes scan{k}_* keys into `out`
    and returns the (donated-through) state. Any failure degrades to the
    already-recorded numbers instead of sinking the bench."""
    try:
        scan_fn = trainer.scan_step(k)
        stacked = jax.tree.map(lambda x: jnp.stack([x] * k), batch)
        t0 = time.time()
        state, ms = scan_fn(state, {}, stacked, base_rng)
        _sync(ms)
        out[f"scan{k}_compile_s"] = round(time.time() - t0, 1)
        group_times = []
        n_groups = n_groups or max(10, steps // k)
        for _ in range(n_groups):
            t0 = time.perf_counter()
            state, ms = scan_fn(state, {}, stacked, base_rng)
            _sync(ms)
            group_times.append(time.perf_counter() - t0)
        gp10, gp50, gp90 = (
            float(np.percentile(group_times, q)) for q in (10, 50, 90)
        )
        out[f"scan{k}_p10_ms_per_step"] = round(gp10 / k * 1e3, 3)
        out[f"scan{k}_p50_ms_per_step"] = round(gp50 / k * 1e3, 3)
        out[f"scan{k}_p90_ms_per_step"] = round(gp90 / k * 1e3, 3)
        out[f"scan{k}_steps_per_sec_p50"] = round(k / gp50, 3)
        # roofline guard: a per-step latency implying more than the
        # chip's bf16 peak is a measurement artifact, never promote it
        if flops_num:
            implied = flops_num * k / gp50 / 1e12
            out[f"scan{k}_implied_tflops"] = round(implied, 6)
            if implied > PEAK_TFLOPS * 1.05:
                out[f"scan{k}_roofline_violation"] = True
    except Exception as e:  # pragma: no cover - device-specific
        out[f"scan{k}_error"] = f"{type(e).__name__}: {e}"[:200]
    return state


def _measure_pipelined(step_call, state, k: int, m: int, reps: int,
                       out: dict, flops_num):
    """Time m back-to-back ASYNC dispatches of an ALREADY-COMPILED
    k-step program with ONE end fence. The donated state threads through
    every dispatch, so device_get of the last metrics transitively waits
    on all m·k steps — the fence cannot under-count. This is fit()'s
    real dispatch discipline (no per-step fence; metric D2H overlaps
    compute, trainer.py) and, unlike the 4·K scan escalation, needs NO
    new compile — on a degraded tunnel it amortizes the per-dispatch
    round trip m× for free. If enqueue itself is synchronous on this
    runtime (the round-3 bounded-queue experiment suggested so in some
    phases), the numbers simply match the blocked mode — recorded either
    way as evidence. Writes pipe{k}x{m}_* keys; sets out['pipelined_key']
    on success so the headline picker can find the mode generically."""
    key = f"pipe{k}x{m}"
    try:
        times = []
        for _ in range(reps):
            ms = None
            t0 = time.perf_counter()
            for _ in range(m):
                state, ms = step_call(state)
            _sync(ms)
            times.append(time.perf_counter() - t0)
        per_step = [t / (m * k) for t in times]
        p10, p50, p90 = (
            float(np.percentile(per_step, q)) for q in (10, 50, 90)
        )
        out[f"{key}_p10_ms_per_step"] = round(p10 * 1e3, 3)
        out[f"{key}_p50_ms_per_step"] = round(p50 * 1e3, 3)
        out[f"{key}_p90_ms_per_step"] = round(p90 * 1e3, 3)
        out[f"{key}_steps_per_sec_p50"] = round(1.0 / p50, 3)
        if flops_num:
            implied = flops_num / p50 / 1e12
            out[f"{key}_implied_tflops"] = round(implied, 6)
            if implied > PEAK_TFLOPS * 1.05:
                out[f"{key}_roofline_violation"] = True
        out["pipelined_key"] = key
    except Exception as e:  # pragma: no cover - device-specific
        out[f"{key}_error"] = f"{type(e).__name__}: {e}"[:200]
    return state


def time_family(cfg, batch_shape, num_classes: int, steps: int, scan_k: int = 0,
                eval_2d: bool = False, eval_3d: bool = False,
                on_first_window=None):
    """Compile + warmup one jitted train step, then `steps` blocked
    per-step timings. Returns dict with p10/p50/p90 (ms), steps/s (p50),
    XLA cost-model FLOPs/step, and the hand-derived analytic FLOPs/step
    (utils/flops.py jaxpr walk: 2MNK dots + conv formula — the
    defensible MFU numerator; the XLA cost model double-counts remat).

    Blocked (one step in flight): free-running dispatch with donated
    multi-GB states can collapse the allocator on this runtime, and a
    bounded 2-deep queue measures no faster (round-3 experiment: 689
    blocked vs 662 queue-2 slices/s under load); blocking costs ~0.1ms.

    NOTE: do NOT pre-split a list of rng keys — holding ~200 live tiny
    device buffers alongside the donated multi-GB state makes every step
    ~40× slower on this runtime (measured: 184ms vs 4.4ms p10)."""
    from icl_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state_bytes = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x in jax.tree.leaves(state)
    )
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=batch_shape), jnp.float32),
        "label": jnp.asarray(
            rng.integers(0, num_classes, size=batch_shape[:-1]), jnp.int32
        ),
    }
    # step_auto folds the per-step key on state.step INSIDE the jitted
    # program — the loop below performs zero host-side RNG dispatches
    # (a host `fold_in`/`split` is an extra device roundtrip per step on
    # this tunneled runtime).
    base_rng = jax.random.PRNGKey(1)
    t0 = time.time()
    state, m = trainer.step_auto(state, batch, base_rng)
    _sync(m)
    compile_s = time.time() - t0

    flops = None
    mem_gb = {}
    try:
        compiled = trainer.step_auto.lower(state, batch, base_rng).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca.get("flops"))
        # XLA compile-time HBM accounting (VERDICT r4 item 7 fallback:
        # this tunneled backend returns memory_stats()=None, so the
        # runtime high-water mark is unavailable; the compiler's
        # arg+temp+output model is the defensible peak for THIS program
        # — it is what must fit in the 16G HBM, remat story included)
        ma = compiled.memory_analysis()
        for k, label in (("argument_size_in_bytes", "xla_args_gb"),
                         ("temp_size_in_bytes", "xla_temps_gb"),
                         ("output_size_in_bytes", "xla_outputs_gb"),
                         ("generated_code_size_in_bytes", "xla_code_mb")):
            v = getattr(ma, k, None)
            if v:
                mem_gb[label] = round(
                    v / 2**20 if label.endswith("mb") else v / 2**30, 2)
        if mem_gb:
            # donated args alias outputs, so peak ≈ args + temps
            mem_gb["xla_peak_gb"] = round(
                mem_gb.get("xla_args_gb", 0) + mem_gb.get("xla_temps_gb", 0), 2)
    except Exception:
        pass
    analytic = None
    try:
        from icl_tpu.utils.flops import analytic_step_flops

        analytic = analytic_step_flops(trainer.step_auto, state, batch, base_rng)
    except Exception:
        pass

    def timed_window(st, mm):
        ts = []
        t_wall = time.perf_counter()
        for _ in range(steps):
            t0 = time.perf_counter()
            st, mm = trainer.step_auto(st, batch, base_rng)
            _sync(mm)
            ts.append(time.perf_counter() - t0)
        return st, mm, ts, time.perf_counter() - t_wall

    state, m, step_times, wall_total = timed_window(state, m)
    windows_p50 = [float(np.percentile(step_times, 50))]
    if on_first_window is not None:
        # degraded-tunnel escape hatch: the caller may emit a provisional
        # artifact from the first real percentiles before the (budget-
        # hungry) retry/scan/eval refinements run
        on_first_window(
            *(float(np.percentile(step_times, q)) for q in (10, 50, 90))
        )
    # Slow-phase retry: this shared tunneled chip oscillates ~20× between
    # phases (round-4 probe: 8.5 ms vs 168 ms for the same step). If the
    # window implies <8% of peak for the counted FLOPs and budget allows,
    # pause and re-measure ONCE — we are benchmarking the framework, not
    # the tunnel weather; every window is recorded, the best is reported.
    floor = (analytic or flops or 0) / (PEAK_TFLOPS * 1e12)
    while (
        floor
        and min(windows_p50) > floor / 0.08
        and len(windows_p50) <= 4
        and remaining() > 360
        and jax.default_backend() != "cpu"
    ):
        time.sleep(60.0)
        state, m, retry_times, retry_wall = timed_window(state, m)
        windows_p50.append(float(np.percentile(retry_times, 50)))
        if windows_p50[-1] == min(windows_p50):
            step_times, wall_total = retry_times, retry_wall
    p10, p50, p90 = (float(np.percentile(step_times, q)) for q in (10, 50, 90))
    out = {
        "steps_per_sec_p50": round(1.0 / p50, 3),
        "p10_ms": round(p10 * 1e3, 3),
        "p50_ms": round(p50 * 1e3, 3),
        "p90_ms": round(p90 * 1e3, 3),
        "compile_or_cache_load_s": round(compile_s, 1),
        # cross-check: sustained steps/s over the whole timed window
        # (catches any per-step timing artifact)
        "steps_per_sec_wall": round(steps / wall_total, 3),
    }
    if len(windows_p50) > 1:
        out["slow_phase_windows_p50_ms"] = [
            round(w * 1e3, 3) for w in windows_p50
        ]
    out["state_gb"] = round(state_bytes / 2**30, 2)
    if flops:
        # XLA cost-model FLOPs. NOTE: counts executed flops including
        # remat recompute and is a cost MODEL, not a profiler read — the
        # derived TFLOP/s is "apparent", can exceed real utilization.
        out["xla_cost_flops_per_step"] = flops
        out["apparent_tflops_at_p50"] = round(flops / p50 / 1e12, 1)
    if analytic:
        # hand-derived 2MNK/conv-formula count of the traced step jaxpr
        # (incl. remat recompute as real equations) — the defensible
        # numerator for MFU claims (BASELINE.md MFU section).
        out["analytic_flops_per_step"] = analytic
        out["analytic_tflops_at_p50"] = round(analytic / p50 / 1e12, 1)
        # the per-family MFU point (VERDICT r4 item 3): analytic FLOPs at
        # the device_get-fenced p50 over the chip's bf16 peak
        out["analytic_mfu_pct_at_p50"] = round(
            analytic / p50 / 1e12 / PEAK_TFLOPS * 100, 1)
    # HBM high-water mark after compile + timed window (VERDICT r4
    # item 7): evidence for the remat story (e.g. swinunetr needs
    # block-remat to fit 16G). Backend-dependent; absent keys are fine.
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            out["hbm_peak_gb"] = round(peak / 2**30, 2)
        live = stats.get("bytes_in_use")
        if live:
            out["hbm_live_gb"] = round(live / 2**30, 2)
    except Exception:
        pass
    out.update(mem_gb)
    if scan_k > 1:
        # Multi-step fusion (cfg.scan_steps): lax.scan scan_k steps into
        # ONE dispatch — amortizes host dispatch/tunnel latency. fit()
        # runs this mode when cfg.scan_steps>1; equivalence to per-step
        # dispatch is tested (tests/test_train_smoke.py scan tests).
        # Fail-safe: any scan-path failure degrades to the per-step
        # numbers above instead of sinking the whole bench.
        state = _measure_scan(trainer, state, batch, base_rng, scan_k,
                              steps, out, analytic or flops)
        k_p50 = out.get(f"scan{scan_k}_p50_ms_per_step")
        # Pipelined mode FIRST — m async dispatches of the ALREADY-
        # COMPILED scan_k program, one end fence (fit()'s dispatch
        # discipline; zero extra compile — see _measure_pipelined).
        if k_p50 is not None and remaining() > 120:
            scan_fn = trainer.scan_step(scan_k)
            stacked = jax.tree.map(lambda x: jnp.stack([x] * scan_k), batch)
            state = _measure_pipelined(
                lambda st: scan_fn(st, {}, stacked, base_rng), state,
                scan_k, m=8, reps=3, out=out, flops_num=analytic or flops,
            )
        # RTT-bound escalation: on a degraded tunnel the per-dispatch
        # round trip dominates even scan8 windows (round-4: ~25-170 ms
        # RTT vs 4.3 ms/step compute). When the scan_k window still sits
        # well above the per-step compute the dispatch overhead implies
        # AND pipelining did not amortize it (synchronous enqueue phase),
        # time ONE larger window (4·scan_k): it amortizes the RTT 4×
        # further, and the two honest window sizes give an RTT-FREE
        # per-step estimate by linear fit (t_window = RTT + K·t_step).
        # The 4·scan_k compile is EXPENSIVE when degraded (fresh program
        # over the tunnel) — the pipe-ratio gate skips it when the free
        # mode already resolved the device-bound rate.
        pipe_p50 = out.get(f"pipe{scan_k}x8_p50_ms_per_step")
        # RTT estimate from the two modes already measured:
        # dispatch = RTT + s, scanK/step = RTT/K + s → their gap ≈ RTT
        rtt_est = out["p50_ms"] - k_p50 if k_p50 is not None else 0.0
        if (
            k_p50 is not None
            and not out.get(f"scan{scan_k}_roofline_violation")
            and rtt_est / scan_k > 0.10 * k_p50  # scanK reading still >10% RTT
            and (pipe_p50 is None or pipe_p50 > 0.6 * k_p50)  # pipe didn't amortize
            and remaining() > 240
            and jax.default_backend() != "cpu"
        ):
            k2 = scan_k * 4
            state = _measure_scan(trainer, state, batch, base_rng, k2,
                                  steps, out, analytic or flops, n_groups=5)
            k2_p50 = out.get(f"scan{k2}_p50_ms_per_step")
            if k2_p50 is not None:
                # two-point fit: window(K) = RTT + K·t_step
                t_step = (k2_p50 * k2 - k_p50 * scan_k) / (k2 - scan_k)
                out["rtt_free_ms_per_step_est"] = round(t_step, 3)
                out["dispatch_rtt_ms_est"] = round(
                    k_p50 * scan_k - t_step * scan_k, 3)
    elif remaining() > 120:
        # no scan mode: pipeline the per-step program itself
        state = _measure_pipelined(
            lambda st: trainer.step_auto(st, batch, base_rng), state,
            1, m=32, reps=3, out=out, flops_num=analytic or flops,
        )
    if eval_2d and os.environ.get("ICL_TPU_BENCH_EVAL", "1") != "0":
        # Serving path: the reference's per-slice cuda round-trip loop
        # (val_2D.py:35-55) becomes ONE jitted batched program per
        # 32-slice bucket. End-to-end predict() timing incl. the host
        # zoom in/out (the full eval protocol).
        try:
            from icl_tpu.eval.infer2d import make_slice_predictor

            predict = make_slice_predictor(trainer.model, cfg.patch_size)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            vol = rng.normal(
                size=(64, *cfg.patch_size)).astype(np.float32)
            predict(variables, vol)  # compile + warmup
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                predict(variables, vol)
                times.append(time.perf_counter() - t0)
            ep50 = float(np.percentile(times, 50))
            out["eval_slices_per_sec_p50"] = round(64 / ep50, 1)
            # Reference-pattern comparator (val_2D.py:38-49 semantics on
            # THIS hardware): one H2D, one single-slice forward dispatch,
            # one D2H per slice — quantifies what the batched/fused
            # serving path buys over the torch loop's structure.
            if os.environ.get("ICL_TPU_BENCH_EVAL_REF", "1") != "0":
                model = trainer.model

                @jax.jit
                def _fwd1(variables, x):  # x: [1, ph, pw, 1]
                    logits = model.apply(variables, x, train=False,
                                         inference=True)
                    return jnp.argmax(logits, axis=-1).astype(jnp.int32)

                np.asarray(_fwd1(variables,
                                 jnp.asarray(vol[0][None, ..., None])))
                t0 = time.perf_counter()
                n_ref = 16  # slices; per-slice round-trips are slow
                for d in range(n_ref):
                    x = jnp.asarray(vol[d][None, ..., None])
                    np.asarray(_fwd1(variables, x))
                ref_s = time.perf_counter() - t0
                out["eval_refpattern_slices_per_sec"] = round(n_ref / ref_s, 1)
        except Exception as e:  # pragma: no cover - device-specific
            out["eval2d_error"] = f"{type(e).__name__}: {e}"[:200]
    if eval_3d and os.environ.get("ICL_TPU_BENCH_EVAL", "1") != "0":
        # 3D serving path: the reference's per-patch cuda loop
        # (val_3D.py:50-73) becomes ONE fused XLA program (gather →
        # chunked forward → scatter-add stitch → argmax). BraTS-protocol
        # volume (~144³ brain crop), stride 64.
        try:
            from icl_tpu.eval.infer3d import make_fused_sliding_window

            predict = make_fused_sliding_window(
                trainer.model, num_classes, cfg.patch_size, sw_batch=4,
            )
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            vol = rng.normal(size=(144, 144, 144)).astype(np.float32)
            predict(variables, vol)  # compile + warmup
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                predict(variables, vol)
                times.append(time.perf_counter() - t0)
            out["eval_vol144_sec_p50"] = round(float(np.percentile(times, 50)), 3)
            # Host-chunked comparator (the reference's val_3D.py:50-73
            # structure: per-sw_batch H2D + forward + D2H, numpy stitch)
            # on the same model/volume — quantifies the fused-program win.
            if os.environ.get("ICL_TPU_BENCH_EVAL_REF", "1") != "0":
                from icl_tpu.eval.infer3d import (make_patch_predictor,
                                                  sliding_window_predict)

                probs_fn = make_patch_predictor(
                    trainer.model, cfg.patch_size, sw_batch=4)
                # reference stride is 64 for 96³ patches; clamp for the
                # tiny-patch harness test so the grid stays gap-free
                sxy = min(64, cfg.patch_size[0])
                sz = min(64, cfg.patch_size[-1])
                sliding_window_predict(  # compile + warmup
                    probs_fn, variables, vol, num_classes, cfg.patch_size,
                    stride_xy=sxy, stride_z=sz)
                t0 = time.perf_counter()
                sliding_window_predict(
                    probs_fn, variables, vol, num_classes, cfg.patch_size,
                    stride_xy=sxy, stride_z=sz)
                out["eval_vol144_hostchunk_sec"] = round(
                    time.perf_counter() - t0, 3)
        except Exception as e:  # pragma: no cover - device-specific
            out["eval3d_error"] = f"{type(e).__name__}: {e}"[:200]
    # Bytes floor (round-5 roofline finding, docs/ROOFLINE.md): one
    # SGD+momentum step must read AND write every param + momentum leaf
    # — ≥ 2 × state bytes of HBM traffic. A per-step latency below
    # 2·state/measured_BW is physically impossible; flag it like the
    # FLOPs roofline violations. (Conservative: ignores activation,
    # gradient and weight-read traffic.)
    bw = ROOFLINE.get("measured_hbm_gbs")
    if bw:
        floor_ms = 2.0 * state_bytes / (bw * 1e9) * 1e3
        out["bytes_floor_ms"] = round(floor_ms, 3)
        for key in ["p50_ms"] + [
            k for k in out if k.endswith("_p50_ms_per_step")
        ]:
            if out[key] < floor_ms * 0.95:
                out[key.replace("p50_ms", "bandwidth_violation")
                       .replace("_per_step", "")] = True
    # release donated buffers before the next family compiles
    try:
        jax.block_until_ready(state)
    except Exception:
        pass  # state donated into a failed scan dispatch
    del state, trainer
    return out


def _arm_watchdog(timeout_s: float, note: str, emit_zero: bool = True):
    """The axon tunnel can hang indefinitely (observed: jax.devices()
    blocking for hours in round 3). A hung bench costs the round its
    BENCH artifact entirely — fire an HONEST zero-value JSON line with
    the error note instead, then hard-exit rc=2. Once the flagship line
    has been printed (ARTIFACT_OUT), a firing watchdog instead runs the
    installed FINALIZE fn — which prints the enriched final line with
    every unfinished family marked skipped — and exits 0: a good
    flagship emit makes a nonzero exit structurally impossible."""
    import threading

    def fire():
        if ARTIFACT_OUT["yes"]:
            fin = FINALIZE["fn"]
            if fin is not None:
                try:
                    fin(note)
                except Exception:
                    pass
            os._exit(0)
        if emit_zero:
            print(json.dumps({
                "metric": "acdc_icl_unet_train_slices_per_sec",
                "value": 0.0,
                "unit": "slices/sec",
                "vs_baseline": 0.0,
                "error": note,
            }), flush=True)
        os._exit(2)

    t = threading.Timer(timeout_s, fire)
    t.daemon = True
    t.start()
    return t


def main():
    from icl_tpu.config import ExperimentConfig

    # Phase 1 watchdog: device discovery. Phase 2 (armed after the
    # flagship line is out): pure backstop against a mid-family hang —
    # exits WITHOUT printing, so the flagship line stays the artifact.
    wd = _arm_watchdog(
        float(os.environ.get("ICL_TPU_BENCH_DEVICE_TIMEOUT", "240")),
        "device discovery hung (tunnel unreachable)")
    jax.devices()
    wd.cancel()
    # headroom over the budget: a degraded tunnel loaded the compile
    # cache in 891 s (round 4) — a slow compile must not be zero-lined,
    # only a genuine hang; the provisional emit below covers slowness.
    wd = _arm_watchdog(
        max(remaining(), 60.0) + 420.0,
        "flagship exceeded the total budget")

    # Empirical chip peaks first (~20 s): the measured HBM bandwidth is
    # the denominator for the bytes-floor guard on every family, and the
    # measured matmul rate sanity-checks PEAK_TFLOPS on this hardware.
    if (jax.default_backend() != "cpu"
            and os.environ.get("ICL_TPU_BENCH_ROOFLINE", "1") != "0"):
        ROOFLINE.update(micro_roofline())
        # '#' prefix: progress note, not a driver-parseable artifact line
        print("# micro_roofline " + json.dumps(ROOFLINE), flush=True)

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
    # Headline = MEDIAN (p50) per-step latency in the scan-fused mode
    # (cfg.scan_steps=8: 8 steps per dispatch — fit()'s recommended perf
    # config, per-step-equivalence-tested). Per-step-dispatch p50 and
    # p10/p90 spread are reported alongside (this tunneled chip
    # oscillates between ~4ms phases and >100ms stall spikes).
    SCAN_K = int(os.environ.get("ICL_TPU_BENCH_SCAN", "8"))
    provisional = {"emitted": False}

    def emit_provisional(w10, w50, w90):
        # Degraded-tunnel escape hatch: when compile+discovery already ate
        # most of the budget (round 4: cache LOAD alone took 891 s), print
        # an honest per-step artifact line NOW — a later kill then costs
        # the refinements (retries/scan/eval/families), not the round.
        if time.time() - T0 < 0.6 * BUDGET:
            return
        sps = batch_size / w50 if w50 else 0.0
        vsb = 1.0
        try:
            rec = json.load(open(BASELINE_FILE))
            if rec.get("stat") == "p50":
                vsb = round(sps / rec["value"], 3)
        except Exception:
            pass
        print(json.dumps({
            "metric": "acdc_icl_unet_train_slices_per_sec",
            "value": round(sps, 3),
            "unit": "slices/sec",
            "vs_baseline": vsb,
            "stat": "PROVISIONAL p50 of first window (budget-pressed)",
            "p10_ms": round(w10 * 1e3, 3),
            "p50_ms": round(w50 * 1e3, 3),
            "p90_ms": round(w90 * 1e3, 3),
            "provisional": True,
        }), flush=True)
        provisional["emitted"] = True
        ARTIFACT_OUT["yes"] = True

    flagship = time_family(
        cfg, (batch_size, patch, patch, 1), 4, steps=150, scan_k=SCAN_K,
        eval_2d=True, on_first_window=emit_provisional,
    )
    # headline = the best NON-VIOLATING measured mode: per-step dispatch,
    # the SCAN_K window, the RTT-escalated 4·SCAN_K window, or the
    # pipelined-dispatch window (all are reachable fit() configs via
    # cfg.scan_steps + fit()'s async dispatch; all device_get-fenced)
    candidates = [f"scan{k}" for k in ((SCAN_K, SCAN_K * 4) if SCAN_K > 1 else ())]
    if flagship.get("pipelined_key"):
        candidates.append(flagship["pipelined_key"])
    best = ""
    best_sps = flagship["steps_per_sec_p50"]
    for mode in candidates:
        sps = flagship.get(f"{mode}_steps_per_sec_p50", 0)
        if (not flagship.get(f"{mode}_roofline_violation")
                and not flagship.get(f"{mode}_bandwidth_violation")
                and sps > best_sps):
            best, best_sps = mode, sps
    if best:
        headline_sps = best_sps
        desc = (f"{best[4:]}-step scan groups (cfg.scan_steps)"
                if best.startswith("scan") else
                f"pipelined {best[4:].replace('x', '-step scan groups × ')}"
                " async dispatches, single end fence (cfg.scan_steps +"
                " cfg.dispatch_depth)")
        stat = f"p50 per-step, {desc}"
        # keep the top-level latency percentiles CONSISTENT with the
        # headline (scan per-step times); dispatch-mode percentiles stay
        # in the families dict under their pXX_ms keys
        p10, p50, p90 = (
            flagship[f"{best}_{q}_ms_per_step"] / 1e3
            for q in ("p10", "p50", "p90")
        )
    else:
        headline_sps = flagship["steps_per_sec_p50"]
        stat = "p50 of 150 blocked steps"
        p10, p50, p90 = (
            flagship[k] / 1e3 for k in ("p10_ms", "p50_ms", "p90_ms")
        )
    slices_per_sec = headline_sps * batch_size

    STAT = "p50"
    # Degraded-window detection: the shared tunnel oscillates ~20-35×
    # for hours (BASELINE.md §round-4); a window implying <8% of peak
    # for the counted FLOPs is tunnel weather, not the framework.
    hl_flops = (flagship.get("analytic_flops_per_step")
                or flagship.get("xla_cost_flops_per_step"))
    degraded = bool(
        hl_flops and headline_sps * hl_flops / 1e12 < 0.08 * PEAK_TFLOPS
        and jax.default_backend() != "cpu"
    )
    baseline = None
    if os.path.exists(BASELINE_FILE):
        try:
            rec = json.load(open(BASELINE_FILE))
            # re-baseline if the headline statistic changed (r1 used p10)
            if rec.get("stat", "p10") == STAT:
                baseline = rec["value"]
        except Exception:
            baseline = None
    baseline_is_self = baseline is None
    if baseline is None:
        # NEVER persist a degraded window as the self-baseline: it would
        # inflate every later healthy run's vs_baseline ~20-35×. Report
        # vs_baseline=1.0 un-persisted and let a healthy run set it.
        if not degraded:
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

    headline = {
        "metric": "acdc_icl_unet_train_slices_per_sec",
        "value": round(slices_per_sec, 3),
        "unit": "slices/sec",
        "vs_baseline": round(slices_per_sec / baseline, 3),
        "stat": stat,
        **({"supersedes_provisional": True} if provisional["emitted"] else {}),
        **(
            {"roofline_anomaly": True}
            if (num := flagship.get("analytic_flops_per_step")
                or flagship.get("xla_cost_flops_per_step"))
            and headline_sps * num / 1e12 > PEAK_TFLOPS * 1.05
            else {}
        ),
        **({"tunnel_degraded": True} if degraded else {}),
        **(
            {"bandwidth_anomaly": True}
            if flagship.get(f"{best}_bandwidth_violation"
                            if best else "bandwidth_violation")
            else {}
        ),
        "p10_ms": round(p10 * 1e3, 3),
        "p50_ms": round(p50 * 1e3, 3),
        "p90_ms": round(p90 * 1e3, 3),
        **({"baseline_is_self": True} if baseline_is_self else {}),
        **({"micro_roofline": dict(ROOFLINE)} if ROOFLINE else {}),
    }
    # CRASH-SAFE EMIT: the round artifact exists from this point on,
    # whatever happens to the secondary families below.
    print(json.dumps(headline), flush=True)
    ARTIFACT_OUT["yes"] = True
    wd.cancel()

    families = {"icl_unet_acdc": dict(flagship, slices_per_sec=round(slices_per_sec, 1))}
    # the families dict ALWAYS carries all four keys: measured, skipped,
    # or error — never silently absent (round-4 defect: watchdog kill
    # left 2 of 4 rows unrecorded).
    run_secondaries = os.environ.get("ICL_TPU_BENCH_FAMILIES", "all") != "flagship"
    SECONDARY_NAMES = ("swinunetr_icl_brats", "unet_3d_icl_brats",
                       "icl_swinunet_acdc", "icl_unet_acdc_bf16state",
                       "icl_unet_acdc_fast")
    for name in SECONDARY_NAMES:
        families[name] = (
            {"skipped": "not reached before run ended"} if run_secondaries
            else {"skipped": "ICL_TPU_BENCH_FAMILIES=flagship"})

    def write_details():
        # incremental: each completed family lands on disk immediately, so
        # a mid-run kill keeps everything measured so far
        try:
            with open(DETAILS_FILE, "w") as f:
                json.dump(dict(headline, families=families,
                               wall_s=round(time.time() - T0, 1)), f, indent=1)
        except Exception:
            pass

    def finalize(note: str = "") -> None:
        # watchdog path: mark whatever is still pending, persist, emit the
        # enriched line — then the caller exits 0.
        if note:
            for fam in families.values():
                if fam.get("skipped") == "not reached before run ended":
                    fam["skipped"] = f"watchdog: {note}"
        write_details()
        print(json.dumps(dict(headline, families=families,
                              wall_s=round(time.time() - T0, 1))), flush=True)

    FINALIZE["fn"] = finalize
    wd = _arm_watchdog(max(remaining(), 30.0) + 120.0,
                       "families overran", emit_zero=False)

    # Degradation-aware budgets: the per-family cost estimates below are
    # healthy-window constants; in a 20-35× degraded tunnel phase
    # (BASELINE.md §round-4) "207 s left ≥ 120 s estimate" admits a
    # family that actually needs ~1 h (the round-4 rc=2 failure mode).
    # Scale every estimate by the observed flagship slowdown.
    healthy_p50_ms = None
    try:
        rec = json.load(open(BASELINE_FILE))
        if rec.get("stat") == "p50" and rec.get("value"):
            healthy_p50_ms = batch_size / rec["value"] * 1e3
    except Exception:
        pass
    if healthy_p50_ms is None and hl_flops:
        # no healthy self-baseline on record: assume 50% MFU as the
        # healthy pace for the counted FLOPs
        healthy_p50_ms = hl_flops / (0.5 * PEAK_TFLOPS * 1e12) * 1e3
    measured_p50_ms = p50 * 1e3
    degradation = (max(1.0, measured_p50_ms / healthy_p50_ms)
                   if healthy_p50_ms else 1.0)
    headline["degradation_ratio"] = round(degradation, 2)

    write_details()
    if run_secondaries:
        # (config builder, batch shape, classes, steps, kwargs, est cost s)
        # 3D families first: their round-3 table rows were corrupted by a
        # transcription slip and re-measuring them is the priority when
        # the budget only covers part of the list.
        secondaries = [
            ("swinunetr_icl_brats",
             ExperimentConfig(
                 model="swinunetr_icl", patch_size=(96, 96, 96), batch_size=4,
                 labeled_bs=2, num_classes=2, max_iterations=30000,
                 consis_weight=10.0, remat=True, precision="bfloat16"),
             (4, 96, 96, 96, 1), 2, 50, {"eval_3d": True}, 240.0),
            ("unet_3d_icl_brats",
             ExperimentConfig(
                 model="unet_3D_icl", patch_size=(96, 96, 96), batch_size=4,
                 labeled_bs=2, num_classes=2, max_iterations=30000,
                 consis_weight=10.0, precision="bfloat16"),
             (4, 96, 96, 96, 1), 2, 50, {"eval_3d": True}, 120.0),
            ("icl_swinunet_acdc",
             ExperimentConfig(
                 model="icl_swinunet", patch_size=(224, 224), batch_size=16,
                 labeled_bs=8, max_iterations=30000, precision="bfloat16"),
             (16, 224, 224, 1), 4, 50, {"eval_2d": True}, 120.0),
            # flagship config with the round-5 bf16 train state
            # (docs/ROOFLINE.md §4: halves the optimizer HBM traffic the
            # flagship is bound by) — measured as its own row so the
            # headline stays the reference-storage config
            ("icl_unet_acdc_bf16state",
             ExperimentConfig(
                 model="icl_unet", patch_size=(256, 256), batch_size=16,
                 labeled_bs=8, max_iterations=30000, precision="bfloat16",
                 state_dtype="bfloat16"),
             (16, 256, 256, 1), 4, 50, {}, 150.0),
            # all round-5 bandwidth optimizations together: bf16 train
            # state + the fused sspa pair (class-decoder weights read
            # once per step — docs/ROOFLINE.md §4.2). The repo's
            # best-foot-forward flagship config.
            ("icl_unet_acdc_fast",
             ExperimentConfig(
                 model="icl_unet", patch_size=(256, 256), batch_size=16,
                 labeled_bs=8, max_iterations=30000, precision="bfloat16",
                 state_dtype="bfloat16", fuse_icl_pair=True),
             (16, 256, 256, 1), 4, 50, {}, 150.0),
        ]
        for name, fcfg, shape, ncls, steps, kw, est in secondaries:
            est_scaled = est * degradation
            if remaining() < est_scaled:
                families[name] = {
                    "skipped": (
                        f"budget: {remaining():.0f}s left < {est_scaled:.0f}s "
                        f"estimate ({est:.0f}s healthy × {degradation:.1f} "
                        "degradation)")
                }
                write_details()
                continue
            try:
                families[name] = time_family(fcfg, shape, ncls, steps, **kw)
            except Exception as e:  # pragma: no cover - device-specific
                families[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            write_details()

    enriched = dict(headline, families=families, wall_s=round(time.time() - T0, 1))
    write_details()
    # final line repeats the SAME headline numbers (+ families): whichever
    # JSON line the driver parses, the flagship values are identical.
    print(json.dumps(enriched), flush=True)


if __name__ == "__main__":
    main()
