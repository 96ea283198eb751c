#!/usr/bin/env python
"""ICL 3D U-Net semi-supervised training on AMOS22 (16 classes).

CLI shim mirroring the reference flags
(train_inherent_consistent_unet_3D_AMOS22.py:33-71): batch 4 (2
labeled), 96³ ROI, 60k iters, lr 0.02, loss = CE+Dice+aux+0.1·pse+
10·consis (:230), val every 1200 iters via MONAI-equivalent
sliding-window (logits stitching, stride 72).
"""
import argparse

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax

from icl_tpu.config import ExperimentConfig
from icl_tpu.data.amos import (
    AMOS_CLASS_NAMES,
    AMOSDataset,
    amos_train_batches,
    load_decathlon_datalist,
)
from icl_tpu.eval.infer3d import evaluate_amos_cases, make_patch_predictor
from icl_tpu.metrics import aggregate_case_metrics
from icl_tpu.train.trainer import Trainer


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, default="../data/AMOS22")
    p.add_argument("--split_path", type=str, default="../data/AMOS22/dataset_semi_ct.json")
    p.add_argument("--exp", type=str, default="AMOS22/Inherent_Consistent_Learning")
    p.add_argument("--model", type=str, default="unet_3D_icl")
    p.add_argument("--num_classes", type=int, default=16)
    p.add_argument("--max_iterations", type=int, default=60000)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--deterministic", type=int, default=1)
    p.add_argument("--base_lr", type=float, default=0.02)
    p.add_argument("--patch_size", type=int, nargs=3, default=[96, 96, 96])
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--labeled_num", type=int, default=30)
    p.add_argument("--total_num", type=int, default=200)
    p.add_argument("--val_num", type=int, default=30)
    p.add_argument("--num_tries", type=str, default="1")
    p.add_argument("--labeled_bs", type=int, default=2)
    p.add_argument("--precision", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 (default): fast MXU passes (the "
                        "reference trains fp32 but evaluates under AMP; "
                        "our float32 parity mode emulates f32 matmuls "
                        "with multi-pass bf16 and its temps push the "
                        "16-class 96^3 bs4 step past 16G HBM)")
    p.add_argument("--scan_steps", type=int, default=1,
                   help="fuse N train steps into one XLA dispatch "
                        "via lax.scan (numerically equivalent to "
                        "per-step dispatch)")
    p.add_argument("--dispatch_depth", type=int, default=1,
                   help="keep up to N step/scan groups in flight before "
                        "fencing the oldest (amortizes per-dispatch "
                        "host-device latency; numerically identical)")
    p.add_argument("--remat", type=int, default=1,
                   help="rematerialize the forward in backprop")
    p.add_argument("--val_interval", type=int, default=1200)
    # multi-process data parallelism (same contract as the 2D flagship
    # CLI: one process per host, identical flags + distinct --process_id;
    # env fallbacks ICL_TPU_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID)
    p.add_argument("--dist_coordinator", type=str, default=None,
                   help="host:port of process 0 (jax.distributed)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    from icl_tpu.parallel.multihost import initialize_from_args, launch_batches

    pid, pcount = initialize_from_args(
        args.dist_coordinator, args.num_processes, args.process_id
    )
    cfg = ExperimentConfig(
        root_path=args.root_path, exp=args.exp, model=args.model,
        num_classes=args.num_classes, max_iterations=args.max_iterations,
        batch_size=args.batch_size, base_lr=args.base_lr,
        patch_size=tuple(args.patch_size), seed=args.seed,
        labeled_num=args.labeled_num, num_tries=args.num_tries,
        labeled_bs=args.labeled_bs, deterministic=args.deterministic,
        val_interval=args.val_interval,
        consis_weight=10.0, pse_weight=0.1,  # AMOS weighting (:230)
        precision=args.precision, scan_steps=args.scan_steps, dispatch_depth=args.dispatch_depth, remat=bool(args.remat),
    )
    datalist = load_decathlon_datalist(args.split_path, "training")
    val_files = load_decathlon_datalist(args.split_path, "validation")[: args.val_num]
    train_ds = AMOSDataset(datalist)
    val_ds = AMOSDataset(val_files, val_mode=True)

    global_batches = amos_train_batches(
        train_ds, cfg.labeled_num, args.total_num, cfg.batch_size,
        cfg.labeled_bs, cfg.patch_size, seed=cfg.seed,
    )
    mesh, batches = launch_batches(global_batches, pcount)
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    # AMOS protocol: bf16 inference (≙ AMP autocast), logits stitching
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
