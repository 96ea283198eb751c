"""bench.py harness plumbing on a tiny CPU config: the per-step timing,
scan-fused timing, cost-analysis, and serving-path sections must all
produce their keys (the driver's end-of-round bench runs this exact
code on the chip at the flagship config — a plumbing break there costs
the round's BENCH artifact)."""
import numpy as np
import pytest

from icl_tpu.config import ExperimentConfig


@pytest.mark.slow
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
    # pipelined mode reuses the compiled scan program (no new compile)
    assert "pipe2x8_error" not in out, out.get("pipe2x8_error")
    assert out["pipelined_key"] == "pipe2x8"
    assert out["pipe2x8_steps_per_sec_p50"] > 0
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


def _canned_family(*a, **kw):
    return {
        "steps_per_sec_p50": 100.0, "p10_ms": 9.0, "p50_ms": 10.0,
        "p90_ms": 11.0, "compile_or_cache_load_s": 0.1,
        "steps_per_sec_wall": 99.0,
    }


def test_main_emits_flagship_line_before_families(monkeypatch, capsys, tmp_path):
    """VERDICT r3 item 1: the flagship JSON must be printed the moment
    the flagship measurement exists; a later family crash must not
    destroy it, and the final enriched line must repeat the SAME
    headline values."""
    import json

    import bench

    calls = {"n": 0}

    def fake_family(cfg, shape, ncls, steps, **kw):
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("secondary family exploded")
        return _canned_family()

    monkeypatch.setattr(bench, "time_family", fake_family)
    monkeypatch.setattr(bench, "BASELINE_FILE", str(tmp_path / "b.json"))
    monkeypatch.setattr(bench, "DETAILS_FILE", str(tmp_path / "d.json"))
    monkeypatch.setattr(bench, "_arm_watchdog",
                        lambda *a, **k: type("T", (), {"cancel": lambda s: None})())
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert len(lines) == 2
    first, last = json.loads(lines[0]), json.loads(lines[-1])
    assert first["value"] == last["value"] == 100.0 * 16
    assert first["metric"] == last["metric"]
    assert "families" not in first and "families" in last
    # the crashed secondaries are recorded, not fatal
    errs = [v for k, v in last["families"].items() if k != "icl_unet_acdc"]
    assert errs and all("error" in v for v in errs)
    assert (tmp_path / "d.json").exists()


def test_main_skips_families_when_budget_exhausted(monkeypatch, capsys, tmp_path):
    import json
    import time

    import bench

    monkeypatch.setattr(bench, "time_family",
                        lambda *a, **kw: _canned_family())
    monkeypatch.setattr(bench, "BASELINE_FILE", str(tmp_path / "b.json"))
    monkeypatch.setattr(bench, "DETAILS_FILE", str(tmp_path / "d.json"))
    monkeypatch.setattr(bench, "_arm_watchdog",
                        lambda *a, **k: type("T", (), {"cancel": lambda s: None})())
    monkeypatch.setattr(bench, "T0", time.time() - bench.BUDGET)  # budget gone
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    last = json.loads(lines[-1])
    skipped = [v for k, v in last["families"].items() if k != "icl_unet_acdc"]
    assert skipped and all("skipped" in v for v in skipped)


def test_main_provisional_emit_under_budget_pressure(monkeypatch, capsys, tmp_path):
    """Degraded-tunnel escape hatch: when compile already ate >60% of the
    budget, the first timed window must produce an immediate provisional
    artifact line; the final headline then marks that it supersedes it."""
    import json
    import time

    import bench

    def fake_family(cfg, shape, ncls, steps, on_first_window=None, **kw):
        if on_first_window is not None:
            on_first_window(0.009, 0.010, 0.011)
        return _canned_family()

    monkeypatch.setattr(bench, "time_family", fake_family)
    monkeypatch.setattr(bench, "BASELINE_FILE", str(tmp_path / "b.json"))
    monkeypatch.setattr(bench, "DETAILS_FILE", str(tmp_path / "d.json"))
    monkeypatch.setattr(bench, "_arm_watchdog",
                        lambda *a, **k: type("T", (), {"cancel": lambda s: None})())
    monkeypatch.setattr(bench, "T0", time.time() - 0.7 * bench.BUDGET)
    monkeypatch.setattr(bench, "ARTIFACT_OUT", {"yes": False})
    monkeypatch.setenv("ICL_TPU_BENCH_FAMILIES", "flagship")
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    recs = [json.loads(l) for l in lines]
    assert recs[0].get("provisional") is True
    assert recs[0]["value"] == round(16.0 / 0.010, 3)
    assert recs[0]["p50_ms"] == 10.0
    # the full headline still follows and flags the supersession
    assert recs[1].get("supersedes_provisional") is True
    assert recs[1]["value"] == 100.0 * 16
    assert bench.ARTIFACT_OUT["yes"] is True


def test_main_no_provisional_when_budget_healthy(monkeypatch, capsys, tmp_path):
    import json

    import bench

    def fake_family(cfg, shape, ncls, steps, on_first_window=None, **kw):
        if on_first_window is not None:
            on_first_window(0.009, 0.010, 0.011)  # called, but budget is fresh
        return _canned_family()

    monkeypatch.setattr(bench, "time_family", fake_family)
    monkeypatch.setattr(bench, "BASELINE_FILE", str(tmp_path / "b.json"))
    monkeypatch.setattr(bench, "DETAILS_FILE", str(tmp_path / "d.json"))
    monkeypatch.setattr(bench, "_arm_watchdog",
                        lambda *a, **k: type("T", (), {"cancel": lambda s: None})())
    import time as _t
    monkeypatch.setattr(bench, "T0", _t.time())
    monkeypatch.setenv("ICL_TPU_BENCH_FAMILIES", "flagship")
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    recs = [json.loads(l) for l in lines]
    assert not any(r.get("provisional") for r in recs)
    assert "supersedes_provisional" not in recs[0]


def test_watchdog_suppresses_zero_line_after_artifact(monkeypatch):
    """Once a real artifact line is out, a firing watchdog must exit 0
    without printing the zero line over it (VERDICT r4 item 2: a good
    flagship emit makes rc≠0 structurally impossible)."""
    import subprocess
    import sys

    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import time\n"
        "import bench\n"
        "bench.ARTIFACT_OUT['yes'] = True\n"
        "bench._arm_watchdog(0.2, 'unit-test hang')\n"
        "time.sleep(10)\n"
    ) % repo_root
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=60)
    assert r.returncode == 0
    assert not [l for l in r.stdout.splitlines() if l.startswith("{")]


def test_watchdog_runs_finalizer_and_exits_zero():
    """After the flagship emit, a firing watchdog must run the installed
    FINALIZE fn (which prints the enriched line with pending families
    marked skipped) and exit 0 — simulating the round-4 failure (watchdog
    kill mid-secondary) now yields a complete artifact and a clean rc."""
    import json
    import subprocess
    import sys

    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import json, time\n"
        "import bench\n"
        "bench.ARTIFACT_OUT['yes'] = True\n"
        "families = {'icl_unet_acdc': {'p50_ms': 10.0},\n"
        "            'swinunetr_icl_brats':"
        " {'skipped': 'not reached before run ended'}}\n"
        "def fin(note):\n"
        "    for f in families.values():\n"
        "        if f.get('skipped') == 'not reached before run ended':\n"
        "            f['skipped'] = 'watchdog: ' + note\n"
        "    print(json.dumps({'metric': 'm', 'value': 1.0,"
        " 'families': families}), flush=True)\n"
        "bench.FINALIZE['fn'] = fin\n"
        "bench._arm_watchdog(0.2, 'families overran')\n"
        "time.sleep(10)\n"
    ) % repo_root
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=60)
    assert r.returncode == 0
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["families"]["swinunetr_icl_brats"]["skipped"] == \
        "watchdog: families overran"


def test_main_degradation_scales_family_estimates(monkeypatch, capsys, tmp_path):
    """Simulated ~30× tunnel slowdown (VERDICT r4 item 2): the flagship
    measures 150 ms/step against a 5 ms healthy self-baseline, so the
    secondary-family cost estimates must scale ~30× and be skipped within
    the small remaining budget — with ALL four family keys present
    (measured | skipped | error), none silently absent."""
    import json
    import time

    import bench

    def fake_family(cfg, shape, ncls, steps, **kw):
        fam = _canned_family()
        # degraded: 150 ms/step → 6.67 steps/s
        fam["steps_per_sec_p50"] = 1000.0 / 150.0
        fam["p10_ms"] = fam["p50_ms"] = fam["p90_ms"] = 150.0
        fam["analytic_flops_per_step"] = 852.6e9
        return fam

    monkeypatch.setattr(bench, "time_family", fake_family)
    bfile = tmp_path / "b.json"
    # healthy self-baseline: 16 slices / 5 ms = 3200 slices/s p50
    bfile.write_text(json.dumps(
        {"metric": "acdc_icl_unet_train_slices_per_sec",
         "value": 3200.0, "stat": "p50"}))
    monkeypatch.setattr(bench, "BASELINE_FILE", str(bfile))
    monkeypatch.setattr(bench, "DETAILS_FILE", str(tmp_path / "d.json"))
    monkeypatch.setattr(bench, "_arm_watchdog",
                        lambda *a, **k: type("T", (), {"cancel": lambda s: None})())
    monkeypatch.setattr(bench, "FINALIZE", {"fn": None})
    # 500 s left of budget: healthy estimates (240/120/120) would all fit,
    # 30×-scaled ones (7200/3600/3600) must all be skipped
    monkeypatch.setattr(bench, "T0", time.time() - (bench.BUDGET - 500.0))
    monkeypatch.setattr(bench.jax, "default_backend", lambda: "tpu")
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    last = json.loads(lines[-1])
    assert last["degradation_ratio"] > 25.0
    fams = last["families"]
    assert set(fams) == {"icl_unet_acdc", "swinunetr_icl_brats",
                        "unet_3d_icl_brats", "icl_swinunet_acdc",
                        "icl_unet_acdc_bf16state", "icl_unet_acdc_fast"}
    for name in ("swinunetr_icl_brats", "unet_3d_icl_brats",
                 "icl_swinunet_acdc", "icl_unet_acdc_bf16state",
                 "icl_unet_acdc_fast"):
        assert "skipped" in fams[name], fams[name]
        assert "degradation" in fams[name]["skipped"]
    # degraded window must also not overwrite the healthy self-baseline
    assert json.loads(bfile.read_text())["value"] == 3200.0


def test_main_roofline_guard_rejects_impossible_scan(monkeypatch, capsys, tmp_path):
    """Round-4 finding: one chip window reported a scan8 per-step latency
    implying 1.75 PFLOP/s on a 197 TFLOP/s chip (block_until_ready
    returning early on the tunneled runtime). The headline selection must
    refuse to promote a scan number that breaks the roofline, falling
    back to the per-step measurement."""
    import json

    import bench

    def fake_family(cfg, shape, ncls, steps, **kw):
        fam = _canned_family()
        # 100 steps/s at 10 TFLOP/step = 1000 TFLOP/s >> 197 peak
        fam["analytic_flops_per_step"] = 1e13
        fam["analytic_tflops_at_p50"] = 100.0
        fam["scan8_steps_per_sec_p50"] = 2000.0
        fam["scan8_p10_ms_per_step"] = 0.45
        fam["scan8_p50_ms_per_step"] = 0.5
        fam["scan8_p90_ms_per_step"] = 0.6
        fam["scan8_implied_tflops"] = 2e4
        fam["scan8_roofline_violation"] = True
        return fam

    monkeypatch.setattr(bench, "time_family", fake_family)
    monkeypatch.setattr(bench, "BASELINE_FILE", str(tmp_path / "b.json"))
    monkeypatch.setattr(bench, "DETAILS_FILE", str(tmp_path / "d.json"))
    monkeypatch.setattr(bench, "_arm_watchdog",
                        lambda *a, **k: type("T", (), {"cancel": lambda s: None})())
    monkeypatch.setenv("ICL_TPU_BENCH_FAMILIES", "flagship")
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    first = json.loads(lines[0])
    # fell back to per-step (100 steps/s × bs16), not the impossible scan
    assert first["value"] == 100.0 * 16
    assert "scan" not in first["stat"]
    # per-step itself implies 1000 TFLOP/s here — flagged, not hidden
    assert first.get("roofline_anomaly") is True


def test_main_promotes_escalated_scan_window(monkeypatch, capsys, tmp_path):
    """RTT-bound tunnel windows: when the 4·K escalated scan window
    measured a better (and roofline-legal) per-step rate than scan K,
    the headline must promote IT — that throughput is reachable via
    cfg.scan_steps and is the closest honest read of device-bound
    per-step time over a slow tunnel."""
    import json

    import bench

    def fake_family(cfg, shape, ncls, steps, **kw):
        fam = _canned_family()
        fam["analytic_flops_per_step"] = 1e9  # keeps everything sub-roofline
        # dispatch 10 ms; scan8 amortizes to 7 ms; scan32 to 5 ms
        fam.update({
            "scan8_steps_per_sec_p50": 142.9, "scan8_p10_ms_per_step": 6.8,
            "scan8_p50_ms_per_step": 7.0, "scan8_p90_ms_per_step": 7.4,
            "scan32_steps_per_sec_p50": 200.0, "scan32_p10_ms_per_step": 4.9,
            "scan32_p50_ms_per_step": 5.0, "scan32_p90_ms_per_step": 5.2,
            "rtt_free_ms_per_step_est": 4.3, "dispatch_rtt_ms_est": 21.6,
        })
        return fam

    monkeypatch.setattr(bench, "time_family", fake_family)
    monkeypatch.setattr(bench, "BASELINE_FILE", str(tmp_path / "b.json"))
    monkeypatch.setattr(bench, "DETAILS_FILE", str(tmp_path / "d.json"))
    monkeypatch.setattr(bench, "_arm_watchdog",
                        lambda *a, **k: type("T", (), {"cancel": lambda s: None})())
    monkeypatch.setenv("ICL_TPU_BENCH_FAMILIES", "flagship")
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    first = json.loads(lines[0])
    assert first["value"] == 200.0 * 16
    assert "32-step scan" in first["stat"]
    assert first["p50_ms"] == 5.0


def test_main_degraded_window_does_not_persist_self_baseline(
        monkeypatch, capsys, tmp_path):
    """A window implying <8% of peak (tunnel weather) must not become
    the persisted self-baseline — it would inflate every later healthy
    run's vs_baseline ~20-35×. The run still reports vs_baseline=1.0 and
    flags tunnel_degraded."""
    import json

    import bench

    def fake_family(cfg, shape, ncls, steps, **kw):
        fam = _canned_family()
        # 100 steps/s at 1 TFLOP/step = 100 TFLOP/s ... make it slow:
        # 0.1 steps/s → 0.1 TFLOP/s ≪ 8% of 197
        fam["steps_per_sec_p50"] = 0.1
        fam["p10_ms"] = fam["p50_ms"] = fam["p90_ms"] = 10000.0
        fam["analytic_flops_per_step"] = 1e12
        return fam

    monkeypatch.setattr(bench, "time_family", fake_family)
    bfile = tmp_path / "b.json"
    monkeypatch.setattr(bench, "BASELINE_FILE", str(bfile))
    monkeypatch.setattr(bench, "DETAILS_FILE", str(tmp_path / "d.json"))
    monkeypatch.setattr(bench, "_arm_watchdog",
                        lambda *a, **k: type("T", (), {"cancel": lambda s: None})())
    monkeypatch.setenv("ICL_TPU_BENCH_FAMILIES", "flagship")
    # pretend we're on a device backend (degraded guard is tpu-only)
    monkeypatch.setattr(bench.jax, "default_backend", lambda: "tpu")
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    first = json.loads(lines[0])
    assert first["tunnel_degraded"] is True
    assert first["vs_baseline"] == 1.0
    assert not bfile.exists()


def test_main_promotes_pipelined_mode(monkeypatch, capsys, tmp_path):
    """When the pipelined-dispatch window (same compiled scan program,
    m async dispatches, one end fence) beats every scan window and is
    roofline-legal, the headline must promote it — it is fit()'s real
    dispatch discipline."""
    import json

    import bench

    def fake_family(cfg, shape, ncls, steps, **kw):
        fam = _canned_family()
        fam["analytic_flops_per_step"] = 1e9
        fam.update({
            "scan8_steps_per_sec_p50": 142.9, "scan8_p10_ms_per_step": 6.8,
            "scan8_p50_ms_per_step": 7.0, "scan8_p90_ms_per_step": 7.4,
            "pipe8x8_steps_per_sec_p50": 232.6, "pipe8x8_p10_ms_per_step": 4.2,
            "pipe8x8_p50_ms_per_step": 4.3, "pipe8x8_p90_ms_per_step": 4.5,
            "pipelined_key": "pipe8x8",
        })
        return fam

    monkeypatch.setattr(bench, "time_family", fake_family)
    monkeypatch.setattr(bench, "BASELINE_FILE", str(tmp_path / "b.json"))
    monkeypatch.setattr(bench, "DETAILS_FILE", str(tmp_path / "d.json"))
    monkeypatch.setattr(bench, "_arm_watchdog",
                        lambda *a, **k: type("T", (), {"cancel": lambda s: None})())
    monkeypatch.setenv("ICL_TPU_BENCH_FAMILIES", "flagship")
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    first = json.loads(lines[0])
    assert first["value"] == pytest.approx(232.6 * 16)
    assert "pipelined" in first["stat"]
    assert first["p50_ms"] == 4.3


def test_main_rejects_violating_escalated_scan(monkeypatch, capsys, tmp_path):
    """A roofline-violating escalated window must NOT be promoted; the
    legal scan8 number stays the headline."""
    import json

    import bench

    def fake_family(cfg, shape, ncls, steps, **kw):
        fam = _canned_family()
        fam.update({
            "scan8_steps_per_sec_p50": 142.9, "scan8_p10_ms_per_step": 6.8,
            "scan8_p50_ms_per_step": 7.0, "scan8_p90_ms_per_step": 7.4,
            "scan32_steps_per_sec_p50": 5000.0, "scan32_p10_ms_per_step": 0.1,
            "scan32_p50_ms_per_step": 0.2, "scan32_p90_ms_per_step": 0.3,
            "scan32_roofline_violation": True,
        })
        return fam

    monkeypatch.setattr(bench, "time_family", fake_family)
    monkeypatch.setattr(bench, "BASELINE_FILE", str(tmp_path / "b.json"))
    monkeypatch.setattr(bench, "DETAILS_FILE", str(tmp_path / "d.json"))
    monkeypatch.setattr(bench, "_arm_watchdog",
                        lambda *a, **k: type("T", (), {"cancel": lambda s: None})())
    monkeypatch.setenv("ICL_TPU_BENCH_FAMILIES", "flagship")
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    first = json.loads(lines[0])
    assert first["value"] == pytest.approx(142.9 * 16)
    assert "8-step scan" in first["stat"]


@pytest.mark.slow  # 20 s; the roofline logic is also unit-covered below
def test_time_family_scan_roofline_flag_tiny_cpu(monkeypatch):
    """time_family must attach the violation flag when the measured scan
    latency is impossibly fast for the counted FLOPs (forced here by a
    tiny fake peak)."""
    import bench

    monkeypatch.setattr(bench, "PEAK_TFLOPS", 1e-9)
    cfg = ExperimentConfig(
        model="unet", patch_size=(16, 16), batch_size=4, labeled_bs=2,
        max_iterations=100,
    )
    out = bench.time_family(cfg, (4, 16, 16, 1), 4, steps=4, scan_k=2)
    assert out.get("scan2_implied_tflops", 0) > 0
    assert out.get("scan2_roofline_violation") is True


def test_time_family_analytic_flops_tiny_cpu():
    import bench

    cfg = ExperimentConfig(
        model="unet", patch_size=(16, 16), batch_size=4, labeled_bs=2,
        max_iterations=100,
    )
    out = bench.time_family(cfg, (4, 16, 16, 1), 4, steps=4)
    assert out.get("analytic_flops_per_step", 0) > 0
    assert out["analytic_tflops_at_p50"] >= 0


def test_micro_roofline_tiny_cpu():
    """Both probes must produce finite positive readings (tiny sizes so
    the single CPU core finishes in seconds; the chip bench runs the
    real 1 GiB / 4096² sizes)."""
    import bench

    out = bench.micro_roofline(reps=2, n=1 << 16, m=128, k_bw=3, k_mm=4)
    assert "hbm_probe_error" not in out, out.get("hbm_probe_error")
    assert "mxu_probe_error" not in out, out.get("mxu_probe_error")
    assert out["measured_hbm_gbs"] > 0
    assert out["measured_mxu_tflops"] > 0


def test_time_family_bytes_floor_flags_impossible_reading(monkeypatch):
    """Round-5 roofline finding: a step must move >= 2x its train-state
    bytes (SGD+momentum read+write). With a (faked) measured bandwidth
    of ~0, every measured latency sits below the floor and must be
    flagged bandwidth_violation; main() must then refuse to promote a
    violating scan mode."""
    import bench

    monkeypatch.setattr(bench, "ROOFLINE", {"measured_hbm_gbs": 1e-6})
    cfg = ExperimentConfig(
        model="unet", patch_size=(16, 16), batch_size=4, labeled_bs=2,
        max_iterations=100,
    )
    out = bench.time_family(cfg, (4, 16, 16, 1), 4, steps=4, scan_k=2)
    assert out["bytes_floor_ms"] > 0
    assert out.get("bandwidth_violation") is True
    assert out.get("scan2_bandwidth_violation") is True


def test_main_rejects_bandwidth_violating_scan(monkeypatch, capsys, tmp_path):
    """A scan window below the bytes floor must NOT be promoted even if
    it passes the FLOPs roofline; the headline flags bandwidth_anomaly
    when the fallback per-step number itself violates."""
    import json

    import bench

    def fake_family(cfg, shape, ncls, steps, **kw):
        fam = _canned_family()
        fam["analytic_flops_per_step"] = 1e9  # FLOPs roofline happy
        fam.update({
            "state_gb": 8.55, "bytes_floor_ms": 22.0,
            "bandwidth_violation": True,  # per-step 10 ms < 22 ms floor
            "scan8_steps_per_sec_p50": 200.0, "scan8_p10_ms_per_step": 4.9,
            "scan8_p50_ms_per_step": 5.0, "scan8_p90_ms_per_step": 5.2,
            "scan8_bandwidth_violation": True,
        })
        return fam

    monkeypatch.setattr(bench, "time_family", fake_family)
    monkeypatch.setattr(bench, "BASELINE_FILE", str(tmp_path / "b.json"))
    monkeypatch.setattr(bench, "DETAILS_FILE", str(tmp_path / "d.json"))
    monkeypatch.setattr(bench, "_arm_watchdog",
                        lambda *a, **k: type("T", (), {"cancel": lambda s: None})())
    monkeypatch.setenv("ICL_TPU_BENCH_FAMILIES", "flagship")
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    first = json.loads(lines[0])
    # fell back to per-step (100 steps/s x bs16), not the violating scan
    assert first["value"] == 100.0 * 16
    assert "scan" not in first["stat"]
    assert first.get("bandwidth_anomaly") is True


@pytest.mark.slow
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
