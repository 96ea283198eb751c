#!/usr/bin/env python
"""Offline BraTS2019 evaluation (reference `code/test_3D_BraTS.py`):
sliding-window (96³, stride 64) whole-tumor Dice/HD95 over val_test."""
import argparse

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

import jax
import jax.numpy as jnp
import numpy as np

from icl_tpu.config import ExperimentConfig
from icl_tpu.data.brats import BraTS2019Dataset
from icl_tpu.eval.infer3d import evaluate_brats_cases, make_patch_predictor
from icl_tpu.models.registry import net_factory
from icl_tpu.utils.checkpoint import load_eval_variables


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, default="../data/BraTS2019")
    p.add_argument("--exp", type=str, default="BraTS2019/Inherent_Consistent_Learning")
    p.add_argument("--model", type=str, default="unet_3D_icl")
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--patch_size", type=int, nargs=3, default=[96, 96, 96])
    p.add_argument("--stride_xy", type=int, default=64)
    p.add_argument("--stride_z", type=int, default=64)
    p.add_argument("--labeled_num", type=int, default=25)
    p.add_argument("--num_tries", type=str, default="1")
    p.add_argument("--test_list", type=str, default="val_test")
    p.add_argument("--checkpoint", type=str, default=None)
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
    if args.model.endswith("_icl"):
        model_kwargs["patch_size"] = int(cfg.patch_size[0])
    model = net_factory(args.model, in_chns=1, class_num=args.num_classes,
                        **model_kwargs)
    d = cfg.patch_size[0]
    eval_vars = load_eval_variables(model, ckpt_path, jnp.zeros((1, d, d, d, 1)))

    db = BraTS2019Dataset(args.root_path, args.test_list)
    probs_fn = make_patch_predictor(model, cfg.patch_size, sw_batch=4)
    metric_cal = evaluate_brats_cases(
        probs_fn, eval_vars, db, args.num_classes, cfg.patch_size,
        args.stride_xy, args.stride_z,
    )
    total = np.zeros(2)
    for ci in range(args.num_classes - 1):
        arr = np.asarray(metric_cal[ci])
        m, s = arr.mean(axis=0), arr.std(axis=0)
        total += m
        print(f"class {ci + 1}: dice {m[0]:.4f}±{s[0]:.4f}  hd95 {m[1]:.4f}±{s[1]:.4f}")
    total /= args.num_classes - 1
    print(f"MEAN: dice {total[0]:.4f}  hd95 {total[1]:.4f}")


if __name__ == "__main__":
    main()
