#!/usr/bin/env python
"""Fully-supervised 3D U-Net on AMOS22 (datalist[:labeled_num]).

CLI shim for the reference script (train_fully_supervised_unet_3D_AMOS22.py;
loss = 0.5·(CE + Dice), :198)."""
import argparse

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax

from icl_tpu.config import ExperimentConfig
from icl_tpu.data.amos import (
    AMOS_CLASS_NAMES,
    AMOSDataset,
    amos_supervised_batches,
    load_decathlon_datalist,
)
from icl_tpu.data.pipeline import Prefetcher
from icl_tpu.eval.infer3d import evaluate_amos_cases, make_patch_predictor
from icl_tpu.metrics import aggregate_case_metrics
from icl_tpu.train.trainer import Trainer


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, default="../data/AMOS22")
    p.add_argument("--split_path", type=str, default="../data/AMOS22/dataset_semi_ct.json")
    p.add_argument("--exp", type=str, default="AMOS22/Fully_Supervised")
    p.add_argument("--model", type=str, default="unet_3D")
    p.add_argument("--num_classes", type=int, default=16)
    p.add_argument("--max_iterations", type=int, default=60000)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--base_lr", type=float, default=0.02)
    p.add_argument("--patch_size", type=int, nargs=3, default=[96, 96, 96])
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--labeled_num", type=int, default=30)
    p.add_argument("--val_num", type=int, default=30)
    p.add_argument("--num_tries", type=str, default="1")
    p.add_argument("--val_interval", type=int, default=1200)
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
        val_interval=args.val_interval,
        precision=args.precision, scan_steps=args.scan_steps, dispatch_depth=args.dispatch_depth,
        seg_weight=0.5,  # loss = 0.5·(CE+Dice) (…AMOS22.py:198)
    )
    datalist = load_decathlon_datalist(args.split_path, "training")
    val_files = load_decathlon_datalist(args.split_path, "validation")[: args.val_num]
    train_ds = AMOSDataset(datalist[: cfg.labeled_num])
    val_ds = AMOSDataset(val_files, val_mode=True)

    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    batches = Prefetcher(
        amos_supervised_batches(
            train_ds, cfg.labeled_num, cfg.batch_size, cfg.patch_size, seed=cfg.seed
        )
    )
    scores_fn = make_patch_predictor(
        trainer.model, cfg.patch_size, sw_batch=4, apply_softmax=False,
        dtype="bfloat16",
    )

    def evaluate(variables):
        metric_cal = evaluate_amos_cases(
            scores_fn, variables, val_ds, cfg.num_classes, cfg.patch_size
        )
        return aggregate_case_metrics(metric_cal)

    trainer.fit(state, batches, evaluate=evaluate, class_names=AMOS_CLASS_NAMES)
    print("Training Finished!")


if __name__ == "__main__":
    main()
