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

Probe proximity for segmentation: 1 − ½·mean|softmax(probe logits) −
one_hot(probe label)| over pixels and classes (the FixMatch formula with
the per-pixel label distribution as the target).
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
from icl_tpu.train.steps import make_fixmatch_cta_step


class CTATrainer:
    def __init__(self, cfg: ExperimentConfig, conf_thresh: float = 0.95,
                 unsup_weight: float = 1.0):
        assert len(cfg.patch_size) == 2, "CTA path is 2D (ACDC)"
        self.cfg = cfg
        self.model = net_factory(cfg.model, in_chns=cfg.in_chns,
                                 class_num=cfg.num_classes)
        self.tx = make_sgd(cfg.base_lr, cfg.max_iterations, cfg.momentum,
                           cfg.weight_decay, cfg.poly_power)
        self.step_jit = jax.jit(
            make_fixmatch_cta_step(self.model, self.tx, cfg.num_classes,
                                   cfg.labeled_bs, conf_thresh, unsup_weight),
            donate_argnums=(0,),
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
        return float(1.0 - 0.5 * jnp.mean(jnp.abs(probs - onehot)))

    def fit(
        self,
        state: TrainState,
        batches: Iterator[dict],
        cta: CTAugment,
        max_steps: Optional[int] = None,
    ) -> TrainState:
        """Run the CTA control loop: train step on policy-augmented
        batches, then update op rates from the batch's probe."""
        steps = max_steps or self.cfg.max_iterations
        rng = jax.random.PRNGKey(self.cfg.seed)
        for it, batch in enumerate(batches):
            if it >= steps:
                break
            policy = batch.pop("probe_policy")
            probe_image = batch.pop("probe_image")
            probe_label = batch.pop("probe_label")
            device_batch = {
                "image_weak": jnp.asarray(batch["image_weak"]),
                "image_strong": jnp.asarray(batch["image_strong"]),
                "label_aug": jnp.asarray(batch["label_aug"], jnp.int32),
            }
            rng, step_rng = jax.random.split(rng)
            state, metrics = self.step_jit(state, device_batch, step_rng)
            # probe AFTER the step, against the updated params (the rate
            # measures how well the current model handles the distortion)
            proximity = self.probe_proximity(state, probe_image, probe_label)
            cta.update_rates(policy, proximity)
            jax.block_until_ready(metrics["loss"])
        return state
