"""2D per-volume inference, batched on device.

The reference evaluates one slice at a time with a host↔device round
trip per slice (val_2D.py:35-55). TPU-native replacement: zoom all
slices of a volume to the patch size on host (identical order-0 scipy
semantics), run ONE jitted forward over the whole slice batch (padded to
a bucket size to avoid recompiles), argmax on device, and zoom back on
host. The metric protocol (per class 1..C−1 binary dice/hd95 with
sentinels) is unchanged.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import zoom as nd_zoom

from icl_tpu.metrics import aggregate_case_metrics, calculate_metric_percase


def make_slice_predictor(model, patch_size, bucket: int = 32) -> Callable:
    """Returns predict(variables, image_volume[D,H,W]) -> labels[D,H,W].

    The jitted program has a static batch of `bucket` slices; volumes are
    processed in padded chunks (buckets amortize compiles across the
    varying D of ACDC volumes).
    """
    ph, pw = patch_size

    @partial(jax.jit, static_argnums=())
    def _forward(variables, x):  # x: [bucket, ph, pw, 1]
        logits = model.apply(variables, x, train=False, inference=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def predict(variables, image: np.ndarray) -> np.ndarray:
        D, H, W = image.shape
        zoomed = np.empty((D, ph, pw), np.float32)
        for d in range(D):
            zoomed[d] = nd_zoom(image[d], (ph / H, pw / W), order=0)
        prediction = np.zeros_like(image, dtype=np.uint8)
        for start in range(0, D, bucket):
            chunk = zoomed[start : start + bucket]
            n = chunk.shape[0]
            if n < bucket:
                chunk = np.pad(chunk, ((0, bucket - n), (0, 0), (0, 0)))
            out = np.asarray(_forward(variables, jnp.asarray(chunk[..., None])))[:n]
            for d in range(n):
                prediction[start + d] = nd_zoom(
                    out[d].astype(np.uint8), (H / ph, W / pw), order=0
                )
        return prediction

    return predict


def generate_pseudo_labels(predict, variables, dataset, root_path: str,
                           patch_size=(224, 224)) -> int:
    """Write per-slice pseudo-label h5 files for self-training rounds
    (val_2D.py:89-109: {root}/slices_iter1/{case}_slice_{i}.h5 with the
    ORIGINAL image and the predicted label). Returns #slices written."""
    import os

    import h5py

    out_dir = os.path.join(root_path, "slices_iter1")
    os.makedirs(out_dir, exist_ok=True)
    count = 0
    for i in range(len(dataset)):
        item = dataset[i]
        image = item["image"]
        prediction = predict(variables, image)
        for d in range(image.shape[0]):
            path = os.path.join(out_dir, f"{item['case']}_slice_{d + 1}.h5")
            with h5py.File(path, "w") as f:
                f.create_dataset("image", data=image[d], compression="gzip")
                f.create_dataset("label", data=prediction[d], compression="gzip")
            count += 1
    return count


def evaluate_acdc_volumes(predict, variables, dataset, num_classes: int):
    """Run the full val protocol over a volume dataset; returns the
    reference aggregation (train_…unet_2D.py:150-170)."""
    metric_cal = [[] for _ in range(num_classes - 1)]
    for i in range(len(dataset)):
        item = dataset[i]
        image, label = item["image"], item["label"]
        prediction = predict(variables, image)
        for cls in range(1, num_classes):
            metric_cal[cls - 1].append(
                calculate_metric_percase(prediction == cls, label == cls)
            )
    return aggregate_case_metrics(metric_cal)
