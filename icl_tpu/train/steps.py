"""Jitted train steps: supervised and ICL semi-supervised.

Each step is one XLA program — forward(s), losses, grads, SGD update and
poly-LR all fused; the host loop only feeds batches and reads metrics
(SURVEY.md §7 design translation). Loss composition mirrors
train_inherent_consistent_unet_2D.py:119-127:

    loss = (CE + Dice)                  on labeled main output
         + AuxLoss(fm_lab, gt)          ICL labeled maps vs gt
         + w_pse · PseudoSoftLoss       ICL unlabeled maps vs detached main unlab
         + w_consis · softmax_mse       USCL vs SSPA maps on unlabeled
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import optax

from icl_tpu import losses
from icl_tpu.train.state import TrainState


def make_supervised_step(
    model, tx: optax.GradientTransformation, num_classes: int,
    seg_weight: float = 1.0, remat: bool = False,
) -> Callable:
    """seg_weight·(CE + Dice) on labeled batches
    (train_fully_supervised_unet_2D_ACDC.py:108-110; the AMOS supervised
    script uses seg_weight 0.5, …unet_3D_AMOS22.py:198).

    remat=True rematerializes the forward during backprop (the TPU
    equivalent of the reference's plumbed-but-off use_checkpoint,
    SURVEY.md §2.6) — trades ~1 extra forward for activation memory."""

    def step(state: TrainState, batch, rng):
        x, y = batch["image"], batch["label"]

        def loss_fn(params):
            logits, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss_ce = losses.cross_entropy_loss(logits, y)
            loss_dice = losses.multiclass_dice_loss(logits, y, num_classes, softmax=True)
            loss = seg_weight * (loss_ce + loss_dice)
            return loss, (mut["batch_stats"], {"loss": loss, "loss_ce": loss_ce,
                                               "loss_dice": loss_dice})

        if remat:
            loss_fn = jax.checkpoint(loss_fn)
        (loss, (new_bs, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
            ),
            metrics,
        )

    return step


def make_icl_step(
    model,
    tx: optax.GradientTransformation,
    num_classes: int,
    labeled_bs: int,
    patch_size: Sequence[int],
    consis_weight: float,
    pse_weight: float = 1.0,
    remat: bool = False,
) -> Callable:
    """Semi-supervised ICL step (train_…unet_2D.py:117-130)."""
    patch = tuple(patch_size)

    def step(state: TrainState, batch, rng):
        x, y = batch["image"], batch["label"]
        x_lab, x_unlab = x[:labeled_bs], x[labeled_bs:]
        y_lab = y[:labeled_bs]

        def loss_fn(params):
            outs, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x_lab,
                x_unlab,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            out_lab, out_unlab, fm_lab, fm_unlab, fm_consis = outs
            loss_ce = losses.cross_entropy_loss(out_lab, y_lab)
            loss_dice = losses.multiclass_dice_loss(out_lab, y_lab, num_classes, softmax=True)
            loss_aux = losses.aux_loss(fm_lab, y_lab, num_classes, patch)
            loss_pse = losses.pseudo_soft_loss(fm_unlab, out_unlab, patch)
            loss_consis = losses.softmax_mse_loss(fm_unlab, fm_consis)
            loss_seg = loss_ce + loss_dice
            loss = (
                loss_seg
                + loss_aux
                + pse_weight * loss_pse
                + consis_weight * loss_consis
            )
            metrics = {
                "loss": loss,
                "loss_seg": loss_seg,
                "loss_ce": loss_ce,
                "loss_dice": loss_dice,
                "loss_aux": loss_aux,
                "loss_pse": loss_pse,
                "loss_aux_consis": consis_weight * loss_consis,
            }
            return loss, (mut["batch_stats"], metrics)

        if remat:
            loss_fn = jax.checkpoint(loss_fn)
        (loss, (new_bs, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
            ),
            metrics,
        )

    return step


def make_fixmatch_cta_step(
    model,
    tx: optax.GradientTransformation,
    num_classes: int,
    labeled_bs: int,
    conf_thresh: float = 0.95,
    unsup_weight: float = 1.0,
    fused_probe: bool = False,
) -> Callable:
    """FixMatch-style step for the CTAugment path (the consumer the
    reference's dormant CTATransform wiring implies,
    dataloaders/dataset.py:106-144): supervised CE+Dice on the weak
    labeled sub-batch; confidence-masked CE between strong-view
    predictions and weak-view pseudo-labels on the unlabeled sub-batch.

    Both forwards run in one XLA program; the strong forward consumes
    the batch stats produced by the weak forward (two sequential BN
    updates, matching two eager torch calls).

    With `fused_probe=True` the batch also carries `probe_image` /
    `probe_label` and the CTA probe forward runs INSIDE the same XLA
    program, on the post-update params (the reference CTA semantics:
    the rate measures how the CURRENT model handles the distortion).
    metrics['probe_proximity'] is the FixMatch weight
    1 − ½·mean_pixels Σ_classes |softmax(p) − one_hot(y)| — one device
    dispatch per CTA iteration instead of two (step + separate probe),
    which halves the per-step host round trips on a tunneled runtime."""
    import jax.numpy as jnp

    def step(state: TrainState, batch, rng):
        xw, xs = batch["image_weak"], batch["image_strong"]
        y = batch["label_aug"]
        rng_w, rng_s = jax.random.split(rng)

        def loss_fn(params):
            logits_w, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                xw, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng_w},
            )
            loss_ce = losses.cross_entropy_loss(
                logits_w[:labeled_bs], y[:labeled_bs])
            loss_dice = losses.multiclass_dice_loss(
                logits_w[:labeled_bs], y[:labeled_bs], num_classes, softmax=True)

            probs_u = jax.nn.softmax(
                jax.lax.stop_gradient(logits_w[labeled_bs:]), axis=-1)
            pseudo = jnp.argmax(probs_u, axis=-1)
            mask = (jnp.max(probs_u, axis=-1) >= conf_thresh).astype(jnp.float32)

            logits_s, mut = model.apply(
                {"params": params, "batch_stats": mut["batch_stats"]},
                xs[labeled_bs:], train=True, mutable=["batch_stats"],
                rngs={"dropout": rng_s},
            )
            ce_pix = optax.softmax_cross_entropy_with_integer_labels(
                logits_s, pseudo)
            loss_unsup = jnp.sum(ce_pix * mask) / jnp.maximum(jnp.sum(mask), 1.0)

            loss = loss_ce + loss_dice + unsup_weight * loss_unsup
            metrics = {
                "loss": loss,
                "loss_ce": loss_ce,
                "loss_dice": loss_dice,
                "loss_unsup": loss_unsup,
                "mask_ratio": jnp.mean(mask),
            }
            return loss, (mut["batch_stats"], metrics)

        (loss, (new_bs, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if fused_probe:
            logits_p = model.apply(
                {"params": new_params, "batch_stats": new_bs},
                batch["probe_image"], train=False,
            )
            probs = jax.nn.softmax(logits_p, axis=-1)
            onehot = jax.nn.one_hot(
                batch["probe_label"], probs.shape[-1], dtype=probs.dtype
            )
            # class-axis L1 SUM per pixel (≤ 2 → proximity ∈ [0, 1]),
            # then pixel mean — identical math to CTATrainer.probe_proximity
            metrics["probe_proximity"] = 1.0 - 0.5 * jnp.mean(
                jnp.sum(jnp.abs(probs - onehot), axis=-1)
            )
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
            ),
            metrics,
        )

    return step


def make_auto_rng_step(step_fn: Callable) -> Callable:
    """Wrap a (state, batch, rng) train step so the per-step key is
    derived ON DEVICE as fold_in(base_rng, state.step): the host loop
    passes the same base-key buffer every step (zero per-step host-side
    RNG dispatches — a host `split`/`fold_in` is a device roundtrip on
    high-latency runtimes), and the RNG stream is a pure function of
    (seed, step), so resume at step k continues the exact stream.
    Trainer.step_auto, Trainer.scan_step's body, and CTATrainer all
    derive keys this way — that shared derivation is what makes
    scan(k) ≡ k dispatched steps."""

    def _auto_rng_step(state, batch, base_rng):
        return step_fn(state, batch, jax.random.fold_in(base_rng, state.step))

    return jax.jit(_auto_rng_step, donate_argnums=(0,))
