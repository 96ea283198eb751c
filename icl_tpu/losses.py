"""Training losses — the exact objective of the reference, channel-last.

Reproduces the numerics of `code/utils/losses.py` in the reference repo
(zhuye98/ICL) with JAX. All functions here take *channel-last* tensors
(``[B, *spatial, C]`` logits/probabilities and ``[B, *spatial]`` integer
labels), the TPU-native layout, whereas the reference is channel-first;
the math is layout-independent.

Key semantics preserved bit-for-bit (reference file:line cited per fn):
  - DiceLoss uses the *squared*-sum denominator (losses.py:208-216).
  - softmax_dice_loss uses the *linear*-sum denominator (losses.py:22-30).
  - Per-class dice sums are global over batch+spatial (not per-sample).
  - Class means include the background class.
  - smooth = 1e-5 on both numerator and denominator.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

SMOOTH = 1e-5


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross entropy, equivalent to torch CrossEntropyLoss().

    logits: [B, *spatial, C] float; labels: [B, *spatial] int.
    Reference usage: train_inherent_consistent_unet_2D.py:99,119.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
    return -jnp.mean(ll)


def dice_loss_squared(score: jax.Array, target: jax.Array) -> jax.Array:
    """Soft dice with squared-sum denominator (losses.py:11-19, :208-216).

    Global sums over all elements of `score`/`target` (any shape).
    """
    target = target.astype(score.dtype)
    intersect = jnp.sum(score * target)
    z = jnp.sum(score * score)
    y = jnp.sum(target * target)
    return 1.0 - (2.0 * intersect + SMOOTH) / (z + y + SMOOTH)


def dice_loss_linear(score: jax.Array, target: jax.Array) -> jax.Array:
    """Soft dice with linear-sum denominator (`dice_loss1`, losses.py:22-30)."""
    target = target.astype(score.dtype)
    intersect = jnp.sum(score * target)
    z = jnp.sum(score)
    y = jnp.sum(target)
    return 1.0 - (2.0 * intersect + SMOOTH) / (z + y + SMOOTH)


def one_hot(labels: jax.Array, num_classes: int) -> jax.Array:
    """One-hot encode integer labels to channel-last float (losses.py:200-206)."""
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def multiclass_dice_loss(
    inputs: jax.Array,
    labels: jax.Array,
    num_classes: int,
    weight: Sequence[float] | None = None,
    softmax: bool = False,
) -> jax.Array:
    """`DiceLoss.forward` (losses.py:218-231).

    inputs: [B, *spatial, C] scores (logits if softmax=True, else probs).
    labels: [B, *spatial] integer ground truth.
    Per-class squared-denominator dice over *global* sums, averaged over
    all classes (background included), optional per-class weights.
    """
    if softmax:
        inputs = jax.nn.softmax(inputs, axis=-1)
    tgt = one_hot(labels, num_classes)
    # Global per-class sums over batch + spatial dims.
    axes = tuple(range(inputs.ndim - 1))
    intersect = jnp.sum(inputs * tgt, axis=axes)
    z = jnp.sum(inputs * inputs, axis=axes)
    y = jnp.sum(tgt * tgt, axis=axes)
    dice = 1.0 - (2.0 * intersect + SMOOTH) / (z + y + SMOOTH)
    if weight is not None:
        dice = dice * jnp.asarray(weight, dtype=dice.dtype)
    return jnp.sum(dice) / num_classes


def softmax_dice_loss(input_logits: jax.Array, target_logits: jax.Array) -> jax.Array:
    """Softmax both sides, per-class linear dice, mean over classes
    (losses.py:42-59). Gradients flow to inputs only if caller detaches
    targets (PseudoSoftLoss does)."""
    input_sm = jax.nn.softmax(input_logits, axis=-1)
    target_sm = jax.nn.softmax(target_logits, axis=-1)
    axes = tuple(range(input_sm.ndim - 1))
    intersect = jnp.sum(input_sm * target_sm, axis=axes)
    z = jnp.sum(input_sm, axis=axes)
    y = jnp.sum(target_sm, axis=axes)
    dice = 1.0 - (2.0 * intersect + SMOOTH) / (z + y + SMOOTH)
    return jnp.mean(dice)


def softmax_mse_loss(
    input_logits: Sequence[jax.Array], target_logits: Sequence[jax.Array]
) -> jax.Array:
    """List variant of `softmax_mse_loss` (losses.py:68-90): per-scale MSE
    between softmaxed maps, targets detached, mean over scales.

    This is `loss_aux_consis`: inputs are USCL maps on unlabeled data,
    targets are SSPA maps on unlabeled data
    (train_inherent_consistent_unet_2D.py:124).
    """
    loss = 0.0
    for inp, tgt in zip(input_logits, target_logits):
        tgt_sm = jax.nn.softmax(jax.lax.stop_gradient(tgt), axis=-1)
        inp_sm = jax.nn.softmax(inp, axis=-1)
        loss = loss + jnp.mean((inp_sm - tgt_sm) ** 2)
    return loss / len(input_logits)


def _resize_maps(feat_map: jax.Array, spatial: Sequence[int]) -> jax.Array:
    """Bi/trilinear upsample of channel-last class maps [B, *s, C] to
    `spatial`, matching torch F.interpolate(mode='bilinear'/'trilinear',
    align_corners=False) — half-pixel centers (jax.image 'linear')."""
    out_shape = (feat_map.shape[0], *spatial, feat_map.shape[-1])
    return jax.image.resize(feat_map.astype(jnp.float32), out_shape, method="linear")


def aux_loss(
    feat_maps: Sequence[jax.Array],
    labels: jax.Array,
    num_classes: int,
    spatial: Sequence[int],
) -> jax.Array:
    """`AuxLoss` / `AuxLoss3D` (losses.py:233-271): for each ICL scale,
    upsample the class map to full patch size, add CE(gt) and
    Dice(softmax, gt); each averaged over scales then summed."""
    loss_ce = 0.0
    loss_dice = 0.0
    for fm in feat_maps:
        fm_full = _resize_maps(fm, spatial)
        loss_ce = loss_ce + cross_entropy_loss(fm_full, labels)
        loss_dice = loss_dice + multiclass_dice_loss(
            fm_full, labels, num_classes, softmax=True
        )
    n = len(feat_maps)
    return loss_ce / n + loss_dice / n


def pseudo_soft_loss(
    feat_maps: Sequence[jax.Array],
    predicts: jax.Array,
    spatial: Sequence[int],
) -> jax.Array:
    """`PseudoSoftLoss` / `3D` (losses.py:273-299): upsample unlabeled ICL
    maps and take softmax_dice_loss against the *detached* main unlabeled
    prediction; mean over scales."""
    de_predicts = jax.lax.stop_gradient(predicts)
    loss = 0.0
    for fm in feat_maps:
        fm_full = _resize_maps(fm, spatial)
        loss = loss + softmax_dice_loss(fm_full, de_predicts)
    return loss / len(feat_maps)


def entropy_loss(p: jax.Array, num_classes: int = 2) -> jax.Array:
    """Normalized entropy of probability maps (losses.py:33-39)."""
    y1 = -jnp.sum(p * jnp.log(p + 1e-6), axis=-1) / jnp.log(float(num_classes))
    return jnp.mean(y1)


def entropy_minimization(p: jax.Array) -> jax.Array:
    """Unnormalized entropy (losses.py:321-325)."""
    return jnp.mean(-jnp.sum(p * jnp.log(p + 1e-6), axis=-1))


def symmetric_mse_loss(input1: Sequence[jax.Array], input2: Sequence[jax.Array]) -> jax.Array:
    """losses.py:115-128: per-scale MSE against the DETACHED first scale of
    input1 (reference indexes input1[0] each iteration — kept), /3."""
    ref = jax.lax.stop_gradient(input1[0])
    loss = 0.0
    for x2 in input2:
        loss = loss + jnp.mean((ref - x2) ** 2)
    return loss / 3.0


def cos_sim_loss(input1: Sequence[jax.Array], input2: Sequence[jax.Array]) -> jax.Array:
    """losses.py:185-192: 1 − cosine(input1[0], input2[0]) summed per
    scale (reference always indexes [0] — kept), /3."""
    a = input1[0].reshape(-1)
    b = input2[0].reshape(-1)
    cos = jnp.dot(a, b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b) + 1e-12)
    return len(input1) * (1.0 - cos) / 3.0


def focal_loss(logits: jax.Array, labels: jax.Array, gamma: float = 2.0,
               alpha: jax.Array | None = None) -> jax.Array:
    """FocalLoss (losses.py:149-183), channel-last, mean reduction."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    logpt = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    pt = jnp.exp(jax.lax.stop_gradient(logpt))
    if alpha is not None:
        at = jnp.asarray(alpha)[labels]
        logpt = logpt * at
    return jnp.mean(-((1.0 - pt) ** gamma) * logpt)


def eam_loss(feat_maps: Sequence[jax.Array], labels: jax.Array,
             spatial: Sequence[int] = (224, 224)) -> jax.Array:
    """EAMLoss (losses.py:130-147): per-scale upsampled CE, /3."""
    loss_ce = 0.0
    for fm in feat_maps:
        loss_ce = loss_ce + cross_entropy_loss(_resize_maps(fm, spatial), labels)
    return loss_ce / 3.0


def kd_loss(guidance_1: Sequence[jax.Array], guidance_2: Sequence[jax.Array],
            temperature: float = 2.0) -> jax.Array:
    """KD_Loss (losses.py:302-318): symmetric KL between temperature-
    softened per-class query distributions; the reference keeps only the
    LAST class index j per scale (loop overwrite) — kept."""
    loss = 0.0
    for g1, g2 in zip(guidance_1, guidance_2):
        j = g1.shape[1] - 1
        p1 = jax.nn.softmax(g1[:, j, :] / temperature, axis=1)
        p2 = jax.nn.softmax(g2[:, j, :] / temperature, axis=1)
        kl = (jnp.sum(p1 * jnp.log(p1 / p2)) + jnp.sum(p2 * jnp.log(p2 / p1))) / 2.0
        loss = loss + kl
    return loss / float(len(guidance_1))


def entropy_loss_map(p: jax.Array) -> jax.Array:
    """losses.py:328-331: per-position unnormalized entropy map."""
    return -jnp.sum(p * jnp.log(p + 1e-6), axis=-1, keepdims=True)


def compute_kl_loss(p: Sequence[jax.Array], q: Sequence[jax.Array]) -> jax.Array:
    """losses.py:334-346: mean symmetric KL over scales (last-axis softmax)."""
    loss = 0.0
    for pn, qn in zip(p, q):
        p_loss = jnp.mean(
            jax.nn.softmax(qn, -1) * (jax.nn.log_softmax(qn, -1) - jax.nn.log_softmax(pn, -1))
        )
        q_loss = jnp.mean(
            jax.nn.softmax(pn, -1) * (jax.nn.log_softmax(pn, -1) - jax.nn.log_softmax(qn, -1))
        )
        loss = loss + (p_loss + q_loss) / 2.0
    return loss / len(q)


def softmax_kl_loss(input_logits: jax.Array, target_logits: jax.Array) -> jax.Array:
    """KL(target || input) with 'mean' reduction over all elements
    (losses.py:93-112): matches torch F.kl_div(log_softmax(in), softmax(tg),
    reduction='mean') — sum of elementwise t*(log t - log in) / numel."""
    input_logp = jax.nn.log_softmax(input_logits, axis=-1)
    target_sm = jax.nn.softmax(target_logits, axis=-1)
    elem = target_sm * (jnp.log(jnp.maximum(target_sm, 1e-38)) - input_logp)
    return jnp.mean(elem)
