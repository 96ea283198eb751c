#!/usr/bin/env python
"""ICL 2D U-Net semi-supervised training on ACDC.

CLI shim preserving the reference script's name and flags
(train_inherent_consistent_unet_2D.py:22-49); all logic lives in the
icl_tpu framework.
"""
import argparse

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


from icl_tpu.config import ExperimentConfig
from icl_tpu.data.acdc import ACDCDataset, patients_to_slices
from icl_tpu.data.pipeline import acdc_train_batches
from icl_tpu.eval.infer2d import evaluate_acdc_volumes, make_slice_predictor
from icl_tpu.train.trainer import Trainer

import jax


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, default="../ACDC")
    p.add_argument("--exp", type=str, default="ACDC/Inherent_Consistent_Learning")
    p.add_argument("--model", type=str, default="icl_unet")
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--max_iterations", type=int, default=30000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--deterministic", type=int, default=1)
    p.add_argument("--base_lr", type=float, default=0.01)
    p.add_argument("--patch_size", type=int, nargs=2, default=[256, 256])
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--labeled_num", type=int, default=7)
    p.add_argument("--num_tries", type=str, default="1")
    p.add_argument("--labeled_bs", type=int, default=8)
    p.add_argument("--val_interval", type=int, default=200)
    p.add_argument("--input_mode", type=str, default="host",
                   choices=["host", "device_bank"],
                   help="host: reference-exact scipy pipeline; device_bank: "
                        "dataset resident in HBM, gather+augment fused into "
                        "the train step (~20x end-to-end on tunneled chips)")
    p.add_argument("--precision", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--state_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="train-state storage: bfloat16 halves the "
                        "per-step HBM traffic of params+momentum "
                        "(stochastically rounded stores, f32 update "
                        "math — docs/ROOFLINE.md)")
    p.add_argument("--fuse_icl_pair", action="store_true",
                   help="fuse the two sspa passes into one batched call "
                        "(class-decoder weights read once per step; "
                        "per-branch BN stats preserved — "
                        "docs/ROOFLINE.md §4.2)")
    p.add_argument("--scan_steps", type=int, default=1,
                   help="fuse N train steps into one XLA dispatch via "
                        "lax.scan (numerically ≡ per-step dispatch; "
                        "amortizes host dispatch latency — recommended 8 "
                        "for perf runs)")
    p.add_argument("--dispatch_depth", type=int, default=1,
                   help="keep up to N step/scan groups in flight before "
                        "fencing the oldest (amortizes per-dispatch "
                        "host-device latency; numerically identical)")
    p.add_argument("--checkpoint_interval", type=int, default=0,
                   help="save a rolling resumable train state every N "
                        "iterations (0 = best-only, reference behavior)")
    # multi-process data parallelism (launch one process per host with
    # identical flags plus a distinct --process_id; env fallbacks
    # ICL_TPU_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID):
    #   python train_inherent_consistent_unet_2D.py ... \
    #     --dist_coordinator host0:1234 --num_processes 2 --process_id 0
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
        checkpoint_interval=args.checkpoint_interval,
        precision=args.precision, state_dtype=args.state_dtype,
        fuse_icl_pair=args.fuse_icl_pair,
        scan_steps=args.scan_steps, dispatch_depth=args.dispatch_depth,
        device_augment=(args.input_mode == "device_bank"),
    )
    labeled_slice = patients_to_slices(cfg.root_path, cfg.labeled_num)

    train_ds = ACDCDataset(cfg.root_path, "train")
    val_ds = ACDCDataset(cfg.root_path, "val_test")
    if pid == 0:
        print(f"Total slices: {len(train_ds)}, labeled slices: {labeled_slice}")

    if pcount > 1:
        assert args.input_mode == "host", (
            "device_bank is a single-host HBM-resident mode; use "
            "--input_mode host for multi-process runs"
        )
    if args.input_mode == "device_bank":
        trainer = Trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
        from icl_tpu.data.device_bank import build_acdc_bank, two_stream_index_batches

        img_bank, lab_bank = build_acdc_bank(train_ds, int(cfg.patch_size[0]))

        def bank_batches():
            for idx in two_stream_index_batches(
                labeled_slice, len(train_ds), cfg.batch_size, cfg.labeled_bs,
                seed=cfg.seed,
            ):
                yield {"image_bank": img_bank, "label_bank": lab_bank,
                       "indices": idx}

        batches = bank_batches()
    else:
        global_batches = acdc_train_batches(
            train_ds, labeled_slice, cfg.batch_size, cfg.labeled_bs,
            cfg.patch_size, seed=cfg.seed,
        )
        mesh, batches = launch_batches(global_batches, pcount)
        trainer = Trainer(cfg, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    predict = make_slice_predictor(trainer.model, cfg.patch_size)

    def evaluate(variables):
        return evaluate_acdc_volumes(predict, variables, val_ds, cfg.num_classes)

    trainer.fit(state, batches, evaluate=evaluate)
    if pid == 0:
        print("Training Finished!")


if __name__ == "__main__":
    main()
