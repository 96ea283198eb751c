"""3D sliding-window inference with overlap stitching.

Reference protocol (val_3D.py:15-82): pad volume to ≥patch, grid of
start positions xs = min(stride·i, dim−patch), softmax per patch,
mean-stitch via score/count maps, argmax, unpad.

TPU-native: the per-patch loop with one H2D per patch becomes chunked
batched forwards (sw_batch patches per jitted call, one compile total);
stitching accumulates on host (one D2H per chunk). Identical numerics.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from icl_tpu.metrics import calculate_metric_percase


def _grid_starts(dim: int, patch: int, stride: int) -> list[int]:
    n = math.ceil((dim - patch) / stride) + 1
    return [min(stride * i, dim - patch) for i in range(n)]


def make_patch_predictor(
    model, patch_size: Sequence[int], sw_batch: int = 4,
    apply_softmax: bool = True, dtype=None,
) -> Callable:
    """Returns fn(variables, patches[sw_batch, *patch, 1]) -> per-patch
    scores, jitted once for a fixed sw_batch.

    apply_softmax=True is the BraTS protocol (softmax then mean-stitch,
    val_3D.py:63-66); apply_softmax=False stitches raw logits, the AMOS
    protocol (MONAI sliding_window_inference stitches logits then argmax,
    val_3D.py:128-133). `dtype` casts inputs (bf16 ≙ the reference's AMP
    autocast at AMOS inference)."""

    @jax.jit
    def _scores(variables, x):
        if dtype is not None:
            x = x.astype(dtype)
        logits = model.apply(variables, x, train=False, inference=True)
        logits = logits.astype(jnp.float32)
        return jax.nn.softmax(logits, axis=-1) if apply_softmax else logits

    return _scores


def sliding_window_predict(
    probs_fn: Callable,
    variables,
    image: np.ndarray,
    num_classes: int,
    patch_size: Sequence[int] = (96, 96, 96),
    stride_xy: int = 64,
    stride_z: int = 64,
    sw_batch: int = 4,
) -> np.ndarray:
    """Label map [W,H,D] for one volume, reference semantics."""
    w, h, d = image.shape
    pw, ph, pd = patch_size
    wp, hp, dp = max(pw - w, 0), max(ph - h, 0), max(pd - d, 0)
    pads = (
        (wp // 2, wp - wp // 2),
        (hp // 2, hp - hp // 2),
        (dp // 2, dp - dp // 2),
    )
    padded = (
        np.pad(image, pads, mode="constant", constant_values=0)
        if (wp or hp or dp)
        else image
    )
    ww, hh, dd = padded.shape

    starts = [
        (xs, ys, zs)
        for xs in _grid_starts(ww, pw, stride_xy)
        for ys in _grid_starts(hh, ph, stride_xy)
        for zs in _grid_starts(dd, pd, stride_z)
    ]

    score = np.zeros((ww, hh, dd, num_classes), np.float32)
    cnt = np.zeros((ww, hh, dd), np.float32)

    for c0 in range(0, len(starts), sw_batch):
        chunk = starts[c0 : c0 + sw_batch]
        patches = np.stack(
            [padded[xs : xs + pw, ys : ys + ph, zs : zs + pd] for xs, ys, zs in chunk]
        ).astype(np.float32)[..., None]
        if len(chunk) < sw_batch:
            patches = np.pad(
                patches, ((0, sw_batch - len(chunk)), (0, 0), (0, 0), (0, 0), (0, 0))
            )
        probs = np.asarray(probs_fn(variables, jnp.asarray(patches)))[: len(chunk)]
        for (xs, ys, zs), p in zip(chunk, probs):
            score[xs : xs + pw, ys : ys + ph, zs : zs + pd] += p
            cnt[xs : xs + pw, ys : ys + ph, zs : zs + pd] += 1.0

    score /= cnt[..., None]
    label_map = np.argmax(score, axis=-1).astype(np.uint8)
    if wp or hp or dp:
        label_map = label_map[
            pads[0][0] : pads[0][0] + w,
            pads[1][0] : pads[1][0] + h,
            pads[2][0] : pads[2][0] + d,
        ]
    return label_map


def make_fused_sliding_window(
    model,
    num_classes: int,
    patch_size: Sequence[int] = (96, 96, 96),
    sw_batch: int = 4,
    apply_softmax: bool = True,
    mesh=None,
):
    """Fully-fused on-device sliding window: patch gather → chunked
    batched forward (lax.map) → scatter-add stitch → argmax, ONE XLA
    program per (padded volume shape, patch count) bucket — zero
    per-patch host↔device traffic (SURVEY.md §7 design translation).

    Returns predict(variables, image[np W,H,D], stride_xy, stride_z) →
    label map. Volumes are padded to multiples of `bucket` per dim to
    bound recompiles.

    With `mesh` (a jax Mesh with a 'data' axis) the patch chunks are
    distributed over the axis via shard_map — each device forwards and
    stitches ITS chunks into a local score/count volume, then one
    psum pair reduces them and every device argmaxes the replicated
    result. The chunk loop is a lax.map (sequential scan semantics), so
    GSPMD alone cannot spread it; explicit chunk sharding is what makes
    N chips ≈ N× serving throughput per volume. Numerics match the
    single-device program up to float32 summation order (sharding the
    chunk list re-associates the score/count accumulation at overlapping
    voxels, so exact-tie argmaxes can in principle flip); weight-0
    padding patches contribute zero to both score and count."""
    pw, ph, pd = patch_size
    ndev = int(mesh.shape["data"]) if mesh is not None else 1

    @partial(jax.jit, static_argnums=(2,))
    def _run(variables, volume, n_chunks, starts):
        # starts: [n_chunks*sw_batch, 3] (padded entries repeat start 0
        # with zero weight)
        def gather(s):
            return jax.lax.dynamic_slice(volume, (s[0], s[1], s[2]), (pw, ph, pd))

        def forward_chunk(chunk_starts_w):
            chunk_starts, w = chunk_starts_w
            patches = jax.vmap(gather)(chunk_starts)[..., None]
            logits = model.apply(variables, patches, train=False, inference=True)
            logits = logits.astype(jnp.float32)
            scores = jax.nn.softmax(logits, -1) if apply_softmax else logits
            return scores * w[:, None, None, None, None]

        starts_c = starts.reshape(n_chunks, sw_batch, 4)
        all_scores = jax.lax.map(
            forward_chunk,
            (starts_c[..., :3], starts_c[..., 3].astype(jnp.float32)),
        )  # [n_chunks, sw_batch, pw, ph, pd, C]

        score = jnp.zeros(volume.shape + (num_classes,), jnp.float32)
        cnt = jnp.zeros(volume.shape, jnp.float32)
        ones = jnp.ones((pw, ph, pd), jnp.float32)

        def accumulate(i, carry):
            score, cnt = carry
            ci, pi = i // sw_batch, i % sw_batch
            s = starts[i]
            patch_scores = all_scores[ci, pi]
            w = s[3].astype(jnp.float32)
            idx = (s[0], s[1], s[2], 0)
            cur = jax.lax.dynamic_slice(score, idx, (pw, ph, pd, num_classes))
            score = jax.lax.dynamic_update_slice(score, cur + patch_scores, idx)
            cur_c = jax.lax.dynamic_slice(cnt, idx[:3], (pw, ph, pd))
            cnt = jax.lax.dynamic_update_slice(cnt, cur_c + ones * w, idx[:3])
            return score, cnt

        score, cnt = jax.lax.fori_loop(
            0, n_chunks * sw_batch, accumulate, (score, cnt)
        )
        label = jnp.argmax(score / jnp.maximum(cnt, 1.0)[..., None], axis=-1)
        return label.astype(jnp.uint8)

    def _local_stitch(variables, volume, starts):
        # local shard of the chunk list: [local_chunks*sw_batch, 4]
        def gather(s):
            return jax.lax.dynamic_slice(volume, (s[0], s[1], s[2]), (pw, ph, pd))

        def forward_chunk(chunk_starts_w):
            chunk_starts, w = chunk_starts_w
            patches = jax.vmap(gather)(chunk_starts)[..., None]
            logits = model.apply(variables, patches, train=False, inference=True)
            logits = logits.astype(jnp.float32)
            scores = jax.nn.softmax(logits, -1) if apply_softmax else logits
            return scores * w[:, None, None, None, None]

        starts_c = starts.reshape(-1, sw_batch, 4)
        all_scores = jax.lax.map(
            forward_chunk,
            (starts_c[..., :3], starts_c[..., 3].astype(jnp.float32)),
        )
        flat_scores = all_scores.reshape(-1, pw, ph, pd, num_classes)

        # the accumulators hold device-varying partials inside shard_map:
        # mark the (replicated-zero) initial carry as 'data'-varying so
        # the fori_loop carry types line up
        score = jax.lax.pcast(
            jnp.zeros(volume.shape + (num_classes,), jnp.float32),
            ("data",), to="varying",
        )
        cnt = jax.lax.pcast(
            jnp.zeros(volume.shape, jnp.float32), ("data",), to="varying"
        )
        ones = jnp.ones((pw, ph, pd), jnp.float32)

        def accumulate(i, carry):
            score, cnt = carry
            s = starts[i]
            idx = (s[0], s[1], s[2], 0)
            cur = jax.lax.dynamic_slice(score, idx, (pw, ph, pd, num_classes))
            score = jax.lax.dynamic_update_slice(score, cur + flat_scores[i], idx)
            cur_c = jax.lax.dynamic_slice(cnt, idx[:3], (pw, ph, pd))
            cnt = jax.lax.dynamic_update_slice(
                cnt, cur_c + ones * s[3].astype(jnp.float32), idx[:3]
            )
            return score, cnt

        score, cnt = jax.lax.fori_loop(
            0, starts.shape[0], accumulate, (score, cnt)
        )
        # one all-reduce pair merges the per-device partial volumes;
        # every device then argmaxes the same replicated result
        score = jax.lax.psum(score, "data")
        cnt = jax.lax.psum(cnt, "data")
        label = jnp.argmax(score / jnp.maximum(cnt, 1.0)[..., None], axis=-1)
        return label.astype(jnp.uint8)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        _run_sharded = jax.jit(jax.shard_map(
            _local_stitch, mesh=mesh,
            in_specs=(P(), P(), P("data")), out_specs=P(),
        ))

    def predict(variables, image: np.ndarray, stride_xy: int = 64,
                stride_z: int = 64, bucket: int = 32) -> np.ndarray:
        w, h, d = image.shape
        # pad to ≥ patch and to bucket multiples (bounded compile count)
        tw = max(pw, math.ceil(w / bucket) * bucket)
        th = max(ph, math.ceil(h / bucket) * bucket)
        td = max(pd, math.ceil(d / bucket) * bucket)
        pads = ((0, tw - w), (0, th - h), (0, td - d))
        padded = np.pad(image, pads) if (tw, th, td) != (w, h, d) else image

        starts = [
            (xs, ys, zs, 1)
            for xs in _grid_starts(tw, pw, stride_xy)
            for ys in _grid_starts(th, ph, stride_xy)
            for zs in _grid_starts(td, pd, stride_z)
        ]
        n = len(starts)
        n_chunks = math.ceil(n / sw_batch)
        if mesh is not None:
            # chunk count must split evenly over the 'data' axis
            n_chunks = math.ceil(n_chunks / ndev) * ndev
        while len(starts) < n_chunks * sw_batch:
            starts.append((0, 0, 0, 0))  # weight-0 padding patches
        starts_arr = jnp.asarray(np.asarray(starts, np.int32))
        if mesh is not None:
            label = np.asarray(
                _run_sharded(variables, jnp.asarray(padded), starts_arr)
            )
        else:
            label = np.asarray(
                _run(variables, jnp.asarray(padded), n_chunks, starts_arr)
            )
        return label[:w, :h, :d]

    return predict


def evaluate_amos_cases(
    scores_fn,
    variables,
    dataset,
    num_classes: int = 16,
    roi=(96, 96, 96),
    sw_batch: int = 4,
):
    """test_all_case_amos protocol (val_3D.py:120-138): MONAI
    sliding_window_inference(roi 96³, sw_batch 4, overlap 0.25 → stride
    72) stitching logits, then argmax; per-organ (dice, hd95)."""
    stride = int(roi[0] * 0.75)
    metric_cal = [[] for _ in range(num_classes - 1)]
    for i in range(len(dataset)):
        item = dataset[i]
        prediction = sliding_window_predict(
            scores_fn, variables, item["image"], num_classes,
            roi, stride, stride, sw_batch,
        )
        for cls in range(1, num_classes):
            # (pred, gt) order matches metrics.calculate_metric_percase
            # and the reference call (val_2D.py:51-53); dice/hd95 happen
            # to be symmetric but future asymmetric metrics are not.
            metric_cal[cls - 1].append(
                calculate_metric_percase(prediction == cls, item["label"] == cls)
            )
    return metric_cal


def evaluate_brats_cases(
    probs_fn,
    variables,
    dataset,
    num_classes: int,
    patch_size=(96, 96, 96),
    stride_xy: int = 64,
    stride_z: int = 64,
    sw_batch: int = 4,
):
    """test_all_case_base protocol (val_3D.py:100-118): per-case, per
    foreground class (dice, hd95); returns metric_cal[class][case]."""
    metric_cal = [[] for _ in range(num_classes - 1)]
    for i in range(len(dataset)):
        item = dataset[i]
        prediction = sliding_window_predict(
            probs_fn, variables, item["image"], num_classes,
            patch_size, stride_xy, stride_z, sw_batch,
        )
        for cls in range(1, num_classes):
            metric_cal[cls - 1].append(
                calculate_metric_percase(prediction == cls, item["label"] == cls)
            )
    return metric_cal
