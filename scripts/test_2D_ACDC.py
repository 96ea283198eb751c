#!/usr/bin/env python
"""Offline ACDC evaluation (reference `code/test_2D_ACDC.py`).

Loads the best checkpoint from the experiment snapshot and prints
per-class and overall mean±std Dice / HD95 over the 60-volume val_test
split (test_2D_ACDC.py:216-234 aggregation; the reference's truncated
`return 1,` both-empty bug at :85 is NOT replicated — sentinels follow
val_2D.py:11-23).
"""
import argparse

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

import jax
import jax.numpy as jnp
import numpy as np

from icl_tpu.config import ExperimentConfig
from icl_tpu.data.acdc import ACDCDataset
from icl_tpu.eval.infer2d import make_slice_predictor
from icl_tpu.metrics import calculate_metric_percase
from icl_tpu.models.registry import net_factory
from icl_tpu.utils.checkpoint import load_eval_variables


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, default="../ACDC")
    p.add_argument("--exp", type=str, default="ACDC/Inherent_Consistent_Learning")
    p.add_argument("--model", type=str, default="icl_unet")
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--patch_size", type=int, nargs=2, default=[256, 256])
    p.add_argument("--labeled_num", type=int, default=7)
    p.add_argument("--num_tries", type=str, default="1")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="explicit path to model_best.msgpack")
    return p.parse_args()


def main():
    args = parse_args()
    cfg = ExperimentConfig(
        root_path=args.root_path, exp=args.exp, model=args.model,
        num_classes=args.num_classes, patch_size=tuple(args.patch_size),
        labeled_num=args.labeled_num, num_tries=args.num_tries,
    )
    ckpt_path = args.checkpoint or os.path.join(
        cfg.snapshot_path, "model", "model_best.msgpack"
    )

    model_kwargs = {}
    if args.model.startswith("icl_") or args.model.endswith("_icl"):
        model_kwargs["patch_size"] = int(cfg.patch_size[0])
    model = net_factory(args.model, in_chns=1, class_num=args.num_classes,
                        **model_kwargs)
    h, w = cfg.patch_size
    eval_vars = load_eval_variables(model, ckpt_path, jnp.zeros((1, h, w, 1)))

    db = ACDCDataset(args.root_path, "val_test")
    predict = make_slice_predictor(model, cfg.patch_size)

    per_class = [[] for _ in range(args.num_classes - 1)]
    for i in range(len(db)):
        item = db[i]
        pred = predict(eval_vars, item["image"])
        for cls in range(1, args.num_classes):
            per_class[cls - 1].append(
                calculate_metric_percase(pred == cls, item["label"] == cls)
            )
        print(f"{item['case']}: done")

    names = ["RV", "Myo", "LV"] if args.num_classes == 4 else [
        str(i) for i in range(1, args.num_classes)
    ]
    total = np.zeros(2)
    for ci, name in enumerate(names):
        arr = np.asarray(per_class[ci])
        m, s = arr.mean(axis=0), arr.std(axis=0)
        total += m
        print(f"{name}: dice {m[0]:.4f}±{s[0]:.4f}  hd95 {m[1]:.4f}±{s[1]:.4f}")
    total /= len(names)
    print(f"MEAN: dice {total[0]:.4f}  hd95 {total[1]:.4f}")


if __name__ == "__main__":
    main()
