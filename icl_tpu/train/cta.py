"""CTAugment-active training: FixMatch step + probe-driven rate learning.

The reference ships CTAugment (augmentations/ctaugment.py) and wires
CTATransform into BaseDataSets (dataloaders/dataset.py:67-68,135-140)
but no entry script activates it. This module supplies the missing
consumer end-to-end: `CTATrainer.fit` draws weak/strong policies from a
live CTAugment learner (data.pipeline.cta_batches), trains with the
FixMatch step (train.steps.make_fixmatch_cta_step), and after every step
updates the op rates from probe proximity — the CTAugment control loop
(rate[idx] = decay·rate + (1−decay)·proximity, ctaugment.py reference
:95-103).

TPU-first dispatch discipline: the probe forward is fused INTO the
train step's XLA program (fused_probe=True) so each CTA iteration costs
ONE device dispatch, and the host-side rate update lags one step by
default (fit(rate_lag=1)) so the proximity scalar's D2H round trip
overlaps the next step's device execution — the control loop's host
coupling no longer serializes a tunnel RTT pair per step.

Probe proximity for segmentation: 1 − ½·mean_pixels Σ_classes
|softmax(probe logits) − one_hot(probe label)| — the FixMatch weight
formula (google-research/fixmatch cta_remixmatch.py: 1 − ½·Σ|p−y|)
applied per pixel, then averaged over pixels/batch. The class-axis SUM
(not mean) keeps the error term in [0, 2] regardless of num_classes, so
the 0.85 sampling threshold behaves as in FixMatch.
"""
from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp

from icl_tpu.config import ExperimentConfig
from icl_tpu.data.ctaugment import CTAugment
from icl_tpu.models.registry import net_factory
from icl_tpu.train.optim import make_sgd
from icl_tpu.train.state import TrainState
from icl_tpu.train.steps import make_auto_rng_step, make_fixmatch_cta_step


class CTATrainer:
    def __init__(self, cfg: ExperimentConfig, conf_thresh: float = 0.95,
                 unsup_weight: float = 1.0):
        assert len(cfg.patch_size) == 2, "CTA path is 2D (ACDC)"
        self.cfg = cfg
        self.model = net_factory(cfg.model, in_chns=cfg.in_chns,
                                 class_num=cfg.num_classes)
        self.tx = make_sgd(cfg.base_lr, cfg.max_iterations, cfg.momentum,
                           cfg.weight_decay, cfg.poly_power)
        step_fn = make_fixmatch_cta_step(self.model, self.tx, cfg.num_classes,
                                         cfg.labeled_bs, conf_thresh,
                                         unsup_weight)
        self.step_jit = jax.jit(step_fn, donate_argnums=(0,))
        # per-step key derived ON DEVICE from (base key, state.step) —
        # shared derivation with Trainer (steps.make_auto_rng_step)
        self.step_auto = make_auto_rng_step(step_fn)
        # fused-probe variant: the CTA probe forward runs INSIDE the train
        # step's XLA program on the post-update params — ONE dispatch per
        # CTA iteration instead of two (fit() uses this path)
        self.step_auto_probe = make_auto_rng_step(
            make_fixmatch_cta_step(self.model, self.tx, cfg.num_classes,
                                   cfg.labeled_bs, conf_thresh,
                                   unsup_weight, fused_probe=True)
        )

        @jax.jit
        def _probe_probs(variables, x):
            logits = self.model.apply(variables, x, train=False)
            return jax.nn.softmax(logits, axis=-1)

        self._probe_probs = _probe_probs

    def init_state(self, rng: jax.Array) -> TrainState:
        cfg = self.cfg
        x = jnp.zeros((cfg.batch_size, *cfg.patch_size, cfg.in_chns), jnp.float32)
        p_rng, d_rng = jax.random.split(rng)
        variables = self.model.init({"params": p_rng, "dropout": d_rng},
                                    x, train=True)
        return TrainState.create(
            variables["params"], variables.get("batch_stats", {}), self.tx
        )

    def probe_proximity(self, state: TrainState, probe_image, probe_label) -> float:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        probs = self._probe_probs(variables, jnp.asarray(probe_image))
        onehot = jax.nn.one_hot(
            jnp.asarray(probe_label), probs.shape[-1], dtype=probs.dtype
        )
        # class-axis L1 sum per pixel (FixMatch formula; the sum is ≤ 2,
        # so proximity stays in [0, 1]), then pixel mean
        per_pixel = jnp.sum(jnp.abs(probs - onehot), axis=-1)
        return float(1.0 - 0.5 * jnp.mean(per_pixel))

    def fit(
        self,
        state: TrainState,
        batches: Iterator[dict],
        cta: CTAugment,
        max_steps: Optional[int] = None,
        snapshot_path: Optional[str] = None,
        rate_lag: int = 1,
    ) -> TrainState:
        """Run the CTA control loop: train step on policy-augmented
        batches, then update op rates from the batch's probe.

        The probe forward is FUSED into the train step's XLA program
        (step_auto_probe): one device dispatch per iteration. With
        `rate_lag=1` (default) the host rate update for step N is applied
        right after step N+1 is dispatched, so the proximity D2H round
        trip overlays step N+1's device execution — the rates a policy
        draw sees are at most one extra step stale, indistinguishable
        from the staleness the threaded prefetch already introduces
        (policies are drawn when a batch is PRODUCED, not consumed).
        `rate_lag=0` fences every step: strict draw→train→update
        sequencing (the reference's eager ordering, ctaugment.py:95-103).

        With `snapshot_path` set and cfg.checkpoint_interval > 0, the
        learned CTA rates are persisted as `{snapshot}/model/
        cta_state.json` next to the rolling TrainState checkpoint, so a
        resumed run keeps its policy (reference StorableCTAugment
        semantics, augmentations/__init__.py:7-17)."""
        import os

        import numpy as np

        from icl_tpu.utils import checkpoint as ckpt

        steps = max_steps or self.cfg.max_iterations
        interval = getattr(self.cfg, "checkpoint_interval", 0)
        rng = jax.random.PRNGKey(self.cfg.seed)
        pending = None  # (policy, device-scalar proximity) awaiting D2H
        for it, batch in enumerate(batches):
            if it >= steps:
                break
            policy = batch.pop("probe_policy")
            device_batch = {
                "image_weak": jnp.asarray(batch["image_weak"]),
                "image_strong": jnp.asarray(batch["image_strong"]),
                "label_aug": jnp.asarray(batch["label_aug"], jnp.int32),
                "probe_image": jnp.asarray(batch["probe_image"]),
                "probe_label": jnp.asarray(batch["probe_label"], jnp.int32),
            }
            state, metrics = self.step_auto_probe(state, device_batch, rng)
            if pending is not None:
                # materializing the PREVIOUS step's proximity now lets its
                # D2H ride under this step's compute; it also bounds the
                # dispatch queue at one in-flight step
                cta.update_rates(pending[0], float(np.asarray(pending[1])))
                pending = None
            # probe ran AFTER the update, against the new params (the rate
            # measures how well the current model handles the distortion)
            if rate_lag == 0:
                cta.update_rates(
                    policy, float(np.asarray(metrics["probe_proximity"]))
                )
            else:
                pending = (policy, metrics["probe_proximity"])
            if snapshot_path and interval and (it + 1) % interval == 0:
                if pending is not None:
                    # flush so the persisted rates are exact at the boundary
                    cta.update_rates(pending[0], float(np.asarray(pending[1])))
                    pending = None
                ckpt.save_train_state_rolling(
                    snapshot_path, state, it + 1,
                    keep=getattr(self.cfg, "keep_checkpoints", 3),
                )
                cta.save(os.path.join(snapshot_path, "model", "cta_state.json"))
        if pending is not None:
            cta.update_rates(pending[0], float(np.asarray(pending[1])))
        if snapshot_path and interval:
            cta.save(os.path.join(snapshot_path, "model", "cta_state.json"))
        return state

    @staticmethod
    def restore_cta(snapshot_path: str, cta: CTAugment) -> bool:
        """Restore persisted CTA rates into `cta` if a saved policy
        exists; returns whether one was found."""
        import os

        path = os.path.join(snapshot_path, "model", "cta_state.json")
        if os.path.exists(path):
            cta.restore(path)
            return True
        return False
