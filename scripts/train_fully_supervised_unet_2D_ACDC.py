#!/usr/bin/env python
"""Fully-supervised 2D U-Net on ACDC (labeled subset only).

CLI shim mirroring the reference script's flags
(train_fully_supervised_unet_2D_ACDC.py:22-49).
"""
import argparse

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


from icl_tpu.config import ExperimentConfig
from icl_tpu.data.acdc import ACDCDataset, patients_to_slices
from icl_tpu.data.pipeline import Prefetcher, supervised_batches
from icl_tpu.eval.infer2d import evaluate_acdc_volumes, make_slice_predictor
from icl_tpu.train.trainer import Trainer

import jax


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, default="../ACDC")
    p.add_argument("--exp", type=str, default="ACDC/Fully_Supervised")
    p.add_argument("--model", type=str, default="unet")
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--max_iterations", type=int, default=30000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--deterministic", type=int, default=1)
    p.add_argument("--base_lr", type=float, default=0.01)
    p.add_argument("--patch_size", type=int, nargs=2, default=[256, 256])
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--labeled_num", type=int, default=7)
    p.add_argument("--num_tries", type=str, default="1")
    p.add_argument("--val_interval", type=int, default=200)
    p.add_argument("--scan_steps", type=int, default=1,
                   help="fuse N train steps into one XLA dispatch "
                        "via lax.scan (numerically equivalent to "
                        "per-step dispatch)")
    p.add_argument("--dispatch_depth", type=int, default=1,
                   help="keep up to N step/scan groups in flight before "
                        "fencing the oldest (amortizes per-dispatch "
                        "host-device latency; numerically identical)")
    p.add_argument("--precision", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    return p.parse_args()


def main():
    args = parse_args()
    cfg = ExperimentConfig(
        root_path=args.root_path, exp=args.exp, model=args.model,
        num_classes=args.num_classes, max_iterations=args.max_iterations,
        batch_size=args.batch_size, base_lr=args.base_lr,
        patch_size=tuple(args.patch_size), seed=args.seed,
        labeled_num=args.labeled_num, num_tries=args.num_tries,
        deterministic=args.deterministic, val_interval=args.val_interval,
        precision=args.precision, scan_steps=args.scan_steps, dispatch_depth=args.dispatch_depth,
    )
    # Labeled-only training: dataset truncated to the labeled prefix
    # (train_fully_supervised_unet_2D_ACDC.py:72-74).
    labeled_slice = patients_to_slices(cfg.root_path, cfg.labeled_num)
    train_ds = ACDCDataset(cfg.root_path, "train", num=labeled_slice)
    val_ds = ACDCDataset(cfg.root_path, "val_test")
    print(f"Train slices (labeled only): {len(train_ds)}")

    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    batches = Prefetcher(
        supervised_batches(train_ds, cfg.batch_size, cfg.patch_size, seed=cfg.seed)
    )

    predict = make_slice_predictor(trainer.model, cfg.patch_size)

    def evaluate(variables):
        return evaluate_acdc_volumes(predict, variables, val_ds, cfg.num_classes)

    trainer.fit(state, batches, evaluate=evaluate)
    print("Training Finished!")


if __name__ == "__main__":
    main()
