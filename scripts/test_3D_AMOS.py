#!/usr/bin/env python
"""Offline AMOS22 evaluation (reference `code/test_3D_AMOS.py`): MONAI-
equivalent sliding-window (96³, sw_batch 4, bf16 ≙ AMP, logits
stitching), per-organ Dice/HD95 on validation[val_num:]."""
import argparse

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

import jax
import jax.numpy as jnp
import numpy as np

from icl_tpu.config import ExperimentConfig
from icl_tpu.data.amos import AMOS_CLASS_NAMES, AMOSDataset, load_decathlon_datalist
from icl_tpu.eval.infer3d import evaluate_amos_cases, make_patch_predictor
from icl_tpu.models.registry import net_factory
from icl_tpu.utils.checkpoint import load_eval_variables


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, default="../data/AMOS22")
    p.add_argument("--split_path", type=str, default="../data/AMOS22/dataset_semi_ct.json")
    p.add_argument("--exp", type=str, default="AMOS22/Inherent_Consistent_Learning")
    p.add_argument("--model", type=str, default="unet_3D_icl")
    p.add_argument("--num_classes", type=int, default=16)
    p.add_argument("--patch_size", type=int, nargs=3, default=[96, 96, 96])
    p.add_argument("--labeled_num", type=int, default=30)
    p.add_argument("--val_num", type=int, default=30,
                   help="test split = validation[val_num:] (test_3D_AMOS.py:153)")
    p.add_argument("--num_tries", type=str, default="1")
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

    val_files = load_decathlon_datalist(args.split_path, "validation")[args.val_num:]
    if not val_files:
        raise SystemExit(
            f"empty test split: validation[{args.val_num}:] has no cases "
            "(the reference evaluates validation[val_num:], "
            "test_3D_AMOS.py:153 — lower --val_num)"
        )
    db = AMOSDataset(val_files, val_mode=True)
    scores_fn = make_patch_predictor(
        model, cfg.patch_size, sw_batch=4, apply_softmax=False, dtype="bfloat16"
    )
    metric_cal = evaluate_amos_cases(
        scores_fn, eval_vars, db, args.num_classes, cfg.patch_size
    )
    total = np.zeros(2)
    for ci, name in enumerate(AMOS_CLASS_NAMES):
        arr = np.asarray(metric_cal[ci])
        m, s = arr.mean(axis=0), arr.std(axis=0)
        total += m
        print(f"{name}: dice {m[0]:.4f}±{s[0]:.4f}  hd95 {m[1]:.4f}±{s[1]:.4f}")
    total /= args.num_classes - 1
    print(f"MEAN: dice {total[0]:.4f}  hd95 {total[1]:.4f}")


if __name__ == "__main__":
    main()
