"""Host input pipeline: batch assembly + background prefetch.

The reference uses 8 forked DataLoader workers doing h5 reads +
scipy augmentations (`train_…unet_2D.py:90-91`). TPU-native replacement:
a lightweight generator assembling channel-last numpy batches, wrapped
in a double-buffered background thread so host augmentation overlaps
device compute, then `jax.device_put` with the train step's sharding.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import numpy as np

from icl_tpu.data.acdc import ACDCDataset
from icl_tpu.data.sampler import two_stream_batches
from icl_tpu.data.transforms import RandomGenerator


def acdc_train_batches(
    dataset: ACDCDataset,
    labeled_count: int,
    batch_size: int,
    labeled_bs: int,
    patch_size,
    seed: int = 1337,
) -> Iterator[dict]:
    """Endless [labeled..., unlabeled...] batches of augmented slices.

    Yields dicts with 'image' [B, H, W, 1] float32, 'label' [B, H, W]
    uint8 (train_…unet_2D.py:86-91 + dataset.py:147-166 semantics).
    """
    total = len(dataset)
    labeled_idxs = list(range(0, labeled_count))
    unlabeled_idxs = list(range(labeled_count, total))
    transform = RandomGenerator(patch_size)
    aug_rng = np.random.default_rng(seed + 1)
    batches = two_stream_batches(
        labeled_idxs, unlabeled_idxs, batch_size, batch_size - labeled_bs, seed=seed
    )
    for idxs in batches:
        imgs, labs = [], []
        for i in idxs:
            item = dataset[i]
            img, lab = transform(item["image"], item["label"], aug_rng)
            imgs.append(img)
            labs.append(lab)
        yield {
            "image": np.stack(imgs).astype(np.float32),
            "label": np.stack(labs).astype(np.uint8),
        }


def acdc_raw_batches(
    dataset: ACDCDataset,
    labeled_count: int,
    batch_size: int,
    labeled_bs: int,
    canon_size: int,
    seed: int = 1337,
) -> Iterator[dict]:
    """Device-augment input mode: [labeled…, unlabeled…] batches of
    UN-augmented slices, order-0 resized on host to one canonical square
    size so the jitted step can run the augmentations on the VPU
    (cfg.device_augment + data.device_augment.augment_batch)."""
    from icl_tpu.data.transforms import zoom_to

    total = len(dataset)
    labeled_idxs = list(range(0, labeled_count))
    unlabeled_idxs = list(range(labeled_count, total))
    batches = two_stream_batches(
        labeled_idxs, unlabeled_idxs, batch_size, batch_size - labeled_bs, seed=seed
    )
    for idxs in batches:
        imgs, labs = [], []
        for i in idxs:
            item = dataset[i]
            imgs.append(zoom_to(item["image"].astype(np.float32),
                                (canon_size, canon_size)))
            labs.append(zoom_to(item["label"].astype(np.uint8),
                                (canon_size, canon_size)))
        yield {
            "image": np.stack(imgs).astype(np.float32),  # [B, S, S] raw
            "label": np.stack(labs).astype(np.uint8),
        }


def supervised_batches(
    dataset,
    batch_size: int,
    patch_size,
    seed: int = 1337,
) -> Iterator[dict]:
    """Endless shuffled labeled-only batches (fully-supervised path,
    train_fully_supervised_unet_2D_ACDC.py:72-78)."""
    transform = RandomGenerator(patch_size)
    rng = np.random.default_rng(seed)
    aug_rng = np.random.default_rng(seed + 1)
    n = len(dataset)
    while True:
        perm = rng.permutation(n)
        for start in range(0, n - batch_size + 1, batch_size):
            imgs, labs = [], []
            for i in perm[start : start + batch_size]:
                item = dataset[int(i)]
                img, lab = transform(item["image"], item["label"], aug_rng)
                imgs.append(img)
                labs.append(lab)
            yield {
                "image": np.stack(imgs).astype(np.float32),
                "label": np.stack(labs).astype(np.uint8),
            }


class Prefetcher:
    """Run an iterator in a background thread with a small buffer so host
    augmentation overlaps device compute."""

    _SENTINEL = object()

    def __init__(self, it: Iterator, buffer_size: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._err: Exception | None = None

        def worker():
            try:
                for item in it:
                    self._q.put(item)
            except Exception as e:  # propagate to consumer
                self._err = e
            finally:
                self._q.put(self._SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def device_stream(
    batches: Iterator[dict],
    put: Callable[[dict], dict] | None = None,
    prefetch: int = 2,
) -> Iterator[dict]:
    """Prefetch host batches with device_put running INSIDE the
    background thread, so H2D transfer overlaps the device step."""
    if put is None:
        import jax
        import jax.numpy as jnp
        import numpy as np

        def put(b):
            return {
                "image": jax.device_put(np.asarray(b["image"], np.float32)),
                "label": jax.device_put(np.asarray(b["label"], np.int32)),
            }

    return iter(Prefetcher((put(b) for b in batches), buffer_size=prefetch))


def cta_batches(
    dataset: ACDCDataset,
    labeled_count: int,
    batch_size: int,
    labeled_bs: int,
    patch_size,
    cta,
    seed: int = 1337,
) -> Iterator[dict]:
    """CTAugment-active two-stream batches (the path the reference wires
    into BaseDataSets via ops_weak/ops_strong, dataset.py:67-68,135-140,
    but never activates from an entry script).

    Per batch, weak/strong policies are sampled from the LIVE `cta`
    learner (so rate updates take effect on the next batch) and applied
    per-sample through CTATransform. Each batch also carries one probe:
    a labeled slice augmented with a probe policy (probe=True draws
    uniform magnitudes, ctaugment.py CTAugment.policy) plus the policy
    itself under the host-only key 'probe_policy' — the trainer computes
    prediction proximity on the probe and calls cta.update_rates.
    """
    from icl_tpu.data.ctaugment import cta_apply
    from icl_tpu.data.transforms import CTATransform, zoom_to

    total = len(dataset)
    labeled_idxs = list(range(0, labeled_count))
    unlabeled_idxs = list(range(labeled_count, total))
    transform = CTATransform(patch_size, cta)
    rng = np.random.default_rng(seed + 2)
    batches = two_stream_batches(
        labeled_idxs, unlabeled_idxs, batch_size, batch_size - labeled_bs, seed=seed
    )
    for idxs in batches:
        ops_weak = cta.policy(probe=False, weak=True)
        ops_strong = cta.policy(probe=False, weak=False)
        weak, strong, labs = [], [], []
        for i in idxs:
            item = dataset[i]
            s = transform(item["image"], item["label"], ops_weak, ops_strong)
            weak.append(s["image_weak"])
            strong.append(s["image_strong"])
            labs.append(s["label_aug"])

        # probe: one random labeled slice through a probe policy
        probe_policy = cta.policy(probe=True, weak=False)
        p_item = dataset[int(rng.choice(labeled_idxs))]
        p_img = zoom_to(p_item["image"].astype(np.float32), tuple(patch_size))
        p_lab = zoom_to(p_item["label"].astype(np.float32) / 255.0,
                        tuple(patch_size))
        p_img = cta_apply(p_img, probe_policy)
        p_lab = np.round(255 * cta_apply(p_lab, probe_policy)).astype(np.int32)

        yield {
            "image_weak": np.stack(weak).astype(np.float32),
            "image_strong": np.stack(strong).astype(np.float32),
            "label_aug": np.stack(labs).astype(np.int32),
            "probe_image": p_img.astype(np.float32)[None, ..., None],
            "probe_label": p_lab[None],
            "probe_policy": probe_policy,
        }
