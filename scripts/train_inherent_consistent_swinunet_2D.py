#!/usr/bin/env python
"""ICL Swin-UNet 2D semi-supervised training on ACDC (224² patches).

CLI shim for the reference script (train_inherent_consistent_swinunet_2D.py):
same losses/weights as the UNet ICL path (CE+Dice+aux+pse+50·consis,
:154-155) at patch 224. Optional ImageNet Swin-T pretrained init via
--pretrained_ckpt (torch checkpoint, converted; reference `load_from`
vision_transformer.py:111-146).
"""
import argparse

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax

from icl_tpu.config import ExperimentConfig
from icl_tpu.data.acdc import ACDCDataset, patients_to_slices
from icl_tpu.data.pipeline import acdc_train_batches
from icl_tpu.eval.infer2d import evaluate_acdc_volumes, make_slice_predictor
from icl_tpu.train.trainer import Trainer


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, default="../ACDC")
    p.add_argument("--exp", type=str, default="ACDC/Inherent_Consistent_Learning")
    p.add_argument("--model", type=str, default="icl_swinunet")
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--max_iterations", type=int, default=30000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--deterministic", type=int, default=1)
    p.add_argument("--base_lr", type=float, default=0.01)
    p.add_argument("--patch_size", type=int, nargs=2, default=[224, 224])
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--labeled_num", type=int, default=7)
    p.add_argument("--num_tries", type=str, default="1")
    p.add_argument("--labeled_bs", type=int, default=8)
    p.add_argument("--val_interval", type=int, default=200)
    p.add_argument("--pretrained_ckpt", type=str, default=None)
    p.add_argument("--precision", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--scan_steps", type=int, default=1,
                   help="fuse N train steps into one XLA dispatch "
                        "via lax.scan (numerically equivalent to "
                        "per-step dispatch)")
    p.add_argument("--dispatch_depth", type=int, default=1,
                   help="keep up to N step/scan groups in flight before "
                        "fencing the oldest (amortizes per-dispatch "
                        "host-device latency; numerically identical)")
    # multi-process data parallelism (same contract as the UNet flagship
    # CLI: one process per host, identical flags + distinct --process_id;
    # env fallbacks ICL_TPU_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID)
    p.add_argument("--dist_coordinator", type=str, default=None,
                   help="host:port of process 0 (jax.distributed)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--cfg", type=str, default=None,
                   help="Swin yaml config (reference config.py:227-234 "
                        "get_config schema); overrides flags for the Swin "
                        "geometry. IMG_SIZE still follows --patch_size.")
    return p.parse_args()


def main():
    args = parse_args()
    from icl_tpu.parallel.multihost import initialize_from_args, launch_batches

    pid, pcount = initialize_from_args(
        args.dist_coordinator, args.num_processes, args.process_id
    )
    from icl_tpu.models.swin_config import swin_cli_kwargs

    swin_kwargs = swin_cli_kwargs(args)
    cfg = ExperimentConfig(
        root_path=args.root_path, exp=args.exp, model=args.model,
        num_classes=args.num_classes, max_iterations=args.max_iterations,
        batch_size=args.batch_size, base_lr=args.base_lr,
        patch_size=tuple(args.patch_size), seed=args.seed,
        labeled_num=args.labeled_num, num_tries=args.num_tries,
        labeled_bs=args.labeled_bs, deterministic=args.deterministic,
        val_interval=args.val_interval,
        precision=args.precision, scan_steps=args.scan_steps, dispatch_depth=args.dispatch_depth,
        model_kwargs=swin_kwargs,
    )
    labeled_slice = patients_to_slices(cfg.root_path, cfg.labeled_num)
    train_ds = ACDCDataset(cfg.root_path, "train")
    val_ds = ACDCDataset(cfg.root_path, "val_test")

    global_batches = acdc_train_batches(
        train_ds, labeled_slice, cfg.batch_size, cfg.labeled_bs,
        cfg.patch_size, seed=cfg.seed,
    )
    mesh, batches = launch_batches(global_batches, pcount)
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed))

    if args.pretrained_ckpt:
        from icl_tpu.utils.torch_import import load_pretrained_swinunet

        state = load_pretrained_swinunet(state, args.pretrained_ckpt)

    predict = make_slice_predictor(trainer.model, cfg.patch_size)

    def evaluate(variables):
        return evaluate_acdc_volumes(predict, variables, val_ds, cfg.num_classes)

    trainer.fit(state, batches, evaluate=evaluate)
    print("Training Finished!")


if __name__ == "__main__":
    main()
