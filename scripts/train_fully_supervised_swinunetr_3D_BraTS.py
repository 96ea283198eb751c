#!/usr/bin/env python
"""Fully-supervised SwinUNETR 3D on BraTS2019 (first labeled_num cases).

CLI shim for the reference script (train_fully_supervised_swinunetr_3D_BraTS.py)."""
import argparse

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax

from icl_tpu.config import ExperimentConfig
from icl_tpu.data.brats import BraTS2019Dataset, brats_supervised_batches
from icl_tpu.data.pipeline import Prefetcher
from icl_tpu.eval.infer3d import evaluate_brats_cases, make_patch_predictor
from icl_tpu.metrics import aggregate_case_metrics
from icl_tpu.train.trainer import Trainer


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, default="../data/BraTS2019")
    p.add_argument("--exp", type=str, default="BraTS2019/Fully_Supervised")
    p.add_argument("--model", type=str, default="swinunetr")
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--max_iterations", type=int, default=30000)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--base_lr", type=float, default=0.01)
    p.add_argument("--patch_size", type=int, nargs=3, default=[96, 96, 96])
    p.add_argument("--feature_size", type=int, default=48)
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--labeled_num", type=int, default=25)
    p.add_argument("--num_tries", type=str, default="1")
    p.add_argument("--val_interval", type=int, default=200)
    p.add_argument("--use_ssl_pretrained", type=int, default=1)
    p.add_argument("--precision", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 (default): fast MXU passes; float32 "
                        "parity mode needs >16G HBM at the 96^3 bs4 config")
    p.add_argument("--scan_steps", type=int, default=1,
                   help="fuse N train steps into one XLA dispatch "
                        "via lax.scan (numerically equivalent to "
                        "per-step dispatch)")
    p.add_argument("--dispatch_depth", type=int, default=1,
                   help="keep up to N step/scan groups in flight before "
                        "fencing the oldest (amortizes per-dispatch "
                        "host-device latency; numerically identical)")
    p.add_argument("--ssl_ckpt", type=str, default="../pretrained_models/model_swinvit.pt")
    return p.parse_args()


def main():
    args = parse_args()
    cfg = ExperimentConfig(
        root_path=args.root_path, exp=args.exp, model=args.model,
        num_classes=args.num_classes, max_iterations=args.max_iterations,
        batch_size=args.batch_size, base_lr=args.base_lr,
        patch_size=tuple(args.patch_size), seed=args.seed,
        labeled_num=args.labeled_num, num_tries=args.num_tries,
        val_interval=args.val_interval,
        remat=True,  # keep 3D Swin activations within HBM
        precision=args.precision, scan_steps=args.scan_steps, dispatch_depth=args.dispatch_depth,
    )
    train_ds = BraTS2019Dataset(cfg.root_path, "train", num=cfg.labeled_num)
    val_ds = BraTS2019Dataset(cfg.root_path, "val_test")

    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    if args.use_ssl_pretrained:
        from icl_tpu.utils.torch_import import load_pretrained_swinvit

        state = load_pretrained_swinvit(state, args.ssl_ckpt)

    batches = Prefetcher(
        brats_supervised_batches(train_ds, cfg.batch_size, cfg.patch_size, seed=cfg.seed)
    )
    probs_fn = make_patch_predictor(trainer.model, cfg.patch_size, sw_batch=4)

    def evaluate(variables):
        metric_cal = evaluate_brats_cases(
            probs_fn, variables, val_ds, cfg.num_classes, cfg.patch_size,
            stride_xy=64, stride_z=64,
        )
        return aggregate_case_metrics(metric_cal)

    trainer.fit(state, batches, evaluate=evaluate, class_names=["WT"])
    print("Training Finished!")


if __name__ == "__main__":
    main()
