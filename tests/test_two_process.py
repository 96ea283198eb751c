"""Two-process jax.distributed CPU test (VERDICT r1 item 7): the >1-
process branches of parallel.multihost — make_global_array across two
hosts and all_gather_case_metrics's real process_allgather — produce
the single-process-equivalent results on every host."""
import json
import os
import socket
import subprocess
import sys

import pytest

# slow tier: excluded from the quick gate (pytest.ini)
pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(__file__), "_dist_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_gather_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 2-device count
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        # Gloo teardown chatter can share the JSON's line; raw_decode
        # parses the object and ignores the trailing junk
        start = out.index('{"pid"')
        outs.append(json.JSONDecoder().raw_decode(out[start:])[0])

    # the global array semantics are host-count-invariant
    want_sum = float(sum(range(32)))
    want_label_sum = sum(range(8))
    for o in outs:
        assert o["sum"] == want_sum
        assert o["label_sum"] == want_label_sum

    # gather = concatenation over processes per class, identical view on
    # every host (matches what a single process holding all cases sees)
    expected = [
        [[0.0, 10.0], [0.25, 20.0], [1.0, 11.0], [1.25, 21.0]],
        [[0.5, 30.0], [0.75, 40.0], [1.5, 31.0], [1.75, 41.0]],
    ]
    for o in outs:
        assert o["gathered"] == expected, o["gathered"]


@pytest.mark.timeout(1800)
def test_two_process_training_matches_single_process(tmp_path):
    """VERDICT r2 item 2: REAL jitted icl_unet train steps across two
    jax.distributed processes (data2×model2 mesh — TP rules active,
    global batches assembled from per-host row blocks) must produce the
    SAME losses and updated params as a single-process single-device
    run, and Trainer.fit must write its snapshot from process 0 only."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    snap_root = str(tmp_path)
    # this 1-core box starves one worker behind the other for minutes;
    # gloo/coordination channels have fixed 30s/300s windows, so pure
    # infra deadline flakes happen under load. Retry once, then SKIP on
    # the infra signature only — any other failure (numerics, crash)
    # fails hard on the first attempt.
    INFRA = ("DEADLINE_EXCEEDED", "BarrierError", "CoordinationServiceError")
    outs = []
    for attempt in (1, 2):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, _WORKER, str(pid), str(port), "train", snap_root],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
            )
            for pid in (0, 1)
        ]
        results = [p.communicate(timeout=840) for p in procs]
        fails = [(p, err) for p, (_, err) in zip(procs, results) if p.returncode]
        if not fails:
            outs = [
                json.JSONDecoder().raw_decode(out[out.index('{"pid"'):])[0]
                for out, _ in results
            ]
            break
        infra_only = all(any(sig in err for sig in INFRA) for _, err in fails)
        assert infra_only, f"worker failed:\n{fails[0][1][-3000:]}"
        if attempt == 2:
            pytest.skip(
                "distributed-infra deadline flake twice (single-core "
                "starvation; gloo 30s / coordination 300s windows): "
                + fails[0][1][-300:]
            )

    # both processes observe identical replicated losses/checksums
    assert outs[0]["losses"] == outs[1]["losses"]
    assert outs[0]["checksum"] == pytest.approx(outs[1]["checksum"], rel=1e-6)
    assert outs[0]["fit_step"] == outs[1]["fit_step"] == 5

    # single-process single-device ground truth: same seeds/batches as
    # _dist_worker.make_train_batches, 3 raw steps + 2 fit steps
    import jax
    import jax.numpy as jnp

    from icl_tpu.config import ExperimentConfig
    from icl_tpu.ops import flags
    from icl_tpu.train.trainer import Trainer

    flags.set_model_axis_size(1)
    def fresh_batches(n):
        # mirrors _dist_worker.make_train_batches: rng(0) restarts per
        # call, so the worker's 2 fit batches repeat its first 2 batches
        rng_np = __import__("numpy").random.default_rng(0)
        return [
            {
                "image": rng_np.normal(size=(4, 16, 16, 1)).astype("float32"),
                "label": rng_np.integers(0, 4, size=(4, 16, 16)).astype("int32"),
            }
            for _ in range(n)
        ]

    batches = fresh_batches(3)
    cfg = ExperimentConfig(
        model="icl_unet", patch_size=(16, 16), batch_size=4, labeled_bs=2,
        max_iterations=5, experiments_dir=str(tmp_path / "single"), exp="ref",
    )
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(cfg.seed)
    ref_losses = []
    for b in batches:
        rng, step_rng = jax.random.split(rng)
        state, metrics = trainer.step_jit(
            state, {k: jnp.asarray(v) for k, v in b.items()}, step_rng)
        ref_losses.append(float(metrics["loss"]))
    state = trainer.fit(state, iter(
        {k: jnp.asarray(v) for k, v in b.items()} for b in fresh_batches(2)))
    checksum = float(jax.jit(
        lambda t: jax.tree.reduce(
            lambda a, c: a + jnp.sum(jnp.abs(c.astype(jnp.float64))), t, 0.0)
    )(state.params))

    # step-1 agreement is tight (different reduction orders only);
    # later steps accumulate f32 drift through the SGD updates — observed
    # 3e-6 → 2.7e-5 → 8.7e-3 absolute over three lr=0.01 steps at 16²
    assert outs[0]["losses"][0] == pytest.approx(ref_losses[0], abs=2e-4)
    for got, want in zip(outs[0]["losses"], ref_losses):
        assert got == pytest.approx(want, rel=5e-3), (outs[0]["losses"], ref_losses)
    # |params| checksum after 5 lr=0.01 steps: same drift scaling
    # (observed rel 2.4e-4 between the sharded and single-device runs)
    assert outs[0]["checksum"] == pytest.approx(checksum, rel=1e-3)

    # process-0-only log writes; the final save is a COLLECTIVE sharded
    # Orbax checkpoint (round 3 — previously skipped with a notice), and
    # the worker's restore round-trip reproduces the trained params
    snap = outs[0]["snapshot"]
    assert os.path.isfile(os.path.join(snap, "log.txt"))
    log = open(os.path.join(snap, "log.txt")).read()
    assert "final sharded save (state spans hosts)" in log
    assert os.path.isdir(os.path.join(snap, "model", "orbax_sharded_last"))
    for o in outs:
        assert o["restored_checksum"] == pytest.approx(o["checksum"], rel=1e-9)
        assert o["restored_step"] == 5
