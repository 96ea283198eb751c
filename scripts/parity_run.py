#!/usr/bin/env python
"""Real-data parity harness: reference torch checkpoint vs icl_tpu, same
eval protocol, side-by-side Dice/HD95.

Executes BASELINE.md measurement-plan item 1 the moment datasets are
available:

    python scripts/parity_run.py --dataset ACDC \
        --root_path /data/ACDC --torch_ckpt /ckpts/model_best.pth \
        --model unet --num_classes 4

    python scripts/parity_run.py --dataset BraTS \
        --root_path /data/BraTS2019 --torch_ckpt /ckpts/model_best.pth \
        --model unet_3D --num_classes 2

Protocol per dataset (identical to the reference):
  * ACDC  — per-slice order-0 zoom to patch, forward, argmax, zoom back
            (val_2D.py:35-55); 60-volume val_test split.
  * BraTS — sliding window 96³ stride 64, softmax mean-stitch
            (val_3D.py:15-82); val_test.txt split.
Metrics: per-class binary dice/hd95 with the reference sentinels, mean
over cases then classes (val_2D.py:11-23, train_…unet_2D.py:158-170).

`--torch_side on` (default when the reference tree is importable) ALSO
runs the real reference torch model on CPU through the same protocol, so
the output is a true side-by-side of the SAME checkpoint under both
frameworks plus the max per-class delta.

`--synthetic` dry-runs the whole harness on generated fixtures (tiny
volumes + a freshly-initialized reference-layout checkpoint) — no real
data needed; used by tests/test_parity_run.py.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

REF = "/root/reference/code"
SHIM = os.path.join(_REPO, "tests", "refshim")

MODEL_FAMILIES = {
    # model key -> (dataset dim, backbone factory key, converter name)
    "unet": ("2d", "unet", "convert_unet2d"),
    "icl_unet": ("2d", "unet", "convert_unet2d"),
    "swinunet": ("2d", "swinunet", "convert_swinunet2d_ckpt"),
    "icl_swinunet": ("2d", "swinunet", "convert_swinunet2d_ckpt"),
    "unet_3D": ("3d", "unet_3D", "convert_unet3d"),
    "unet_3D_icl": ("3d", "unet_3D", "convert_unet3d"),
    "swinunetr": ("3d", "swinunetr", "convert_swinunetr_ckpt"),
    "swinunetr_icl": ("3d", "swinunetr", "convert_swinunetr_ckpt"),
}


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["ACDC", "BraTS"], default="ACDC")
    p.add_argument("--root_path", type=str, default=None,
                   help="preprocessed dataset root (volumes/ + val_test.list "
                        "for ACDC; data/ + val_test.txt for BraTS)")
    p.add_argument("--torch_ckpt", type=str, default=None,
                   help="reference model_best.pth (ICL-stripped dialect)")
    p.add_argument("--model", type=str, default="unet",
                   choices=sorted(MODEL_FAMILIES))
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--patch_size", type=int, nargs="+", default=None,
                   help="default: 256² ACDC unet, 224² swinunet, 96³ BraTS")
    p.add_argument("--limit", type=int, default=None, help="max cases")
    p.add_argument("--torch_side", choices=["auto", "on", "off"],
                   default="auto",
                   help="also evaluate the checkpoint with the real "
                        "reference torch model on CPU")
    p.add_argument("--synthetic", action="store_true",
                   help="dry-run on generated fixtures (no real data)")
    p.add_argument("--json_out", type=str, default=None)
    return p.parse_args(argv)


# ------------------------------------------------------------- fixtures
def build_synthetic_acdc(root: str, n_cases: int = 2, shape=(4, 70, 70)):
    import h5py

    os.makedirs(os.path.join(root, "volumes"), exist_ok=True)
    rng = np.random.default_rng(0)
    cases = [f"synth{i:03d}" for i in range(n_cases)]
    for c in cases:
        img = rng.normal(size=shape).astype(np.float32)
        lab = np.zeros(shape, np.uint8)
        # a few blobs so foreground classes are non-empty
        d, h, w = shape
        lab[:, h // 4: h // 2, w // 4: w // 2] = 1
        lab[:, h // 2: 3 * h // 4, w // 4: w // 2] = 2
        lab[:, h // 4: h // 2, w // 2: 3 * w // 4] = 3
        with h5py.File(os.path.join(root, "volumes", f"{c}.h5"), "w") as f:
            f.create_dataset("image", data=img)
            f.create_dataset("label", data=lab)
    with open(os.path.join(root, "val_test.list"), "w") as f:
        f.write("\n".join(cases) + "\n")


def build_synthetic_brats(root: str, n_cases: int = 1, shape=(100, 100, 70)):
    import h5py

    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    rng = np.random.default_rng(0)
    cases = [f"synth{i:03d}" for i in range(n_cases)]
    for c in cases:
        img = rng.normal(size=shape).astype(np.float32)
        lab = np.zeros(shape, np.uint8)
        lab[30:60, 30:60, 20:50] = 1
        with h5py.File(os.path.join(root, "data", f"{c}.h5"), "w") as f:
            f.create_dataset("image", data=img)
            f.create_dataset("label", data=lab)
    with open(os.path.join(root, "val_test.txt"), "w") as f:
        f.write("\n".join(cases) + "\n")


def make_synthetic_ckpt(model_key: str, num_classes: int, path: str):
    """Freshly-initialized REAL reference model, saved in the ICL-stripped
    best-checkpoint dialect (train_…unet_2D.py:177-181)."""
    import torch

    net = build_reference_net(model_key, num_classes)
    sd = {k: v for k, v in net.state_dict().items()
          if "sspa" not in k and "uscl" not in k}
    torch.save(sd, path)


# ----------------------------------------------------------- torch side
def reference_importable() -> bool:
    return os.path.isdir(REF)


def _ref_path():
    for p in (REF, SHIM):
        if p not in sys.path:
            sys.path.insert(0, p)


def swinunet_config_ns(img_size: int = 224):
    """The swin_tiny_patch4_window7_224_lite.yaml constants as the
    attribute-tree the reference SwinUnet wrappers read (config.py) —
    no yacs needed."""
    from types import SimpleNamespace as NS

    return NS(
        DATA=NS(IMG_SIZE=img_size),
        MODEL=NS(
            SWIN=NS(PATCH_SIZE=4, IN_CHANS=3, EMBED_DIM=96,
                    DEPTHS=[2, 2, 2, 2], NUM_HEADS=[3, 6, 12, 24],
                    WINDOW_SIZE=7, MLP_RATIO=4.0, QKV_BIAS=True,
                    QK_SCALE=None, APE=False, PATCH_NORM=True),
            DROP_RATE=0.0, DROP_PATH_RATE=0.1),
        TRAIN=NS(USE_CHECKPOINT=False),
    )


def build_reference_net(model_key: str, num_classes: int):
    """Instantiate the real reference backbone on CPU (eval mode). All 8
    model keys supported — the Swin families import through
    tests/refshim's einops/timm/monai stand-ins (VERDICT r2 item 1)."""
    _ref_path()
    family = MODEL_FAMILIES[model_key][1]
    if family == "unet":
        from networks.unet import UNet

        return UNet(in_chns=1, class_num=num_classes).eval()
    if family == "unet_3D":
        from networks.unet_3D import unet_3D

        return unet_3D(feature_scale=4, n_classes=num_classes,
                       in_channels=1).eval()
    if family == "swinunet":
        from networks.vision_transformer_base import SwinUnet

        return SwinUnet(swinunet_config_ns(), img_size=224,
                        num_classes=num_classes).eval()
    if family == "swinunetr":
        from networks.swinunetr import SwinUNETR

        return SwinUNETR(img_size=(96, 96, 96), in_channels=1,
                         out_channels=num_classes, feature_size=48).eval()
    raise SystemExit(f"--torch_side: unknown reference family {family}")


def torch_predictor_2d(net, patch_size):
    """Same per-slice protocol as make_slice_predictor, torch forward."""
    import torch
    from scipy.ndimage import zoom as nd_zoom

    ph, pw = patch_size

    def predict(_variables, image: np.ndarray) -> np.ndarray:
        D, H, W = image.shape
        pred = np.zeros_like(image, dtype=np.uint8)
        with torch.no_grad():
            for d in range(D):
                sl = nd_zoom(image[d], (ph / H, pw / W), order=0)
                x = torch.from_numpy(sl[None, None].astype(np.float32))
                out = torch.argmax(torch.softmax(net(x), dim=1), dim=1)[0]
                pred[d] = nd_zoom(out.numpy().astype(np.uint8),
                                  (H / ph, W / pw), order=0)
        return pred

    return predict


def torch_probs_fn_3d(net):
    """probs_fn(variables, patches[n,*patch,1]) for sliding_window_predict,
    channel-last in/out, torch forward on CPU."""
    import torch

    def probs(_variables, patches) -> np.ndarray:
        x = np.moveaxis(np.asarray(patches), -1, 1)
        with torch.no_grad():
            y = torch.softmax(net(torch.from_numpy(x)), dim=1)
        return np.moveaxis(y.numpy(), 1, -1)

    return probs


# ------------------------------------------------------------- jax side
def build_jax(model_key: str, num_classes: int, patch_size, sd):
    import jax.numpy as jnp

    from icl_tpu.models.registry import net_factory
    from icl_tpu.utils import torch_import as ti

    backbone = MODEL_FAMILIES[model_key][1]
    model = net_factory(backbone, in_chns=1, class_num=num_classes)
    converter = getattr(ti, MODEL_FAMILIES[model_key][2])
    params, batch_stats, missing = converter(sd)
    if missing:
        print(f"[parity_run] WARNING: {len(missing)} reference keys absent "
              f"from checkpoint (first 5: {missing[:5]})")
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    # structural check: converted tree must match a fresh init
    import jax

    x = jnp.zeros((1, *patch_size, 1))
    ref_vars = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    got = jax.tree_util.tree_structure(variables)
    want = jax.tree_util.tree_structure(
        {k: ref_vars[k] for k in variables})
    if got != want:
        raise SystemExit("converted checkpoint does not match the "
                         f"{backbone} parameter structure")
    return model, variables


# ------------------------------------------------------------ reporting
CLASS_NAMES = {4: ["RV", "Myo", "LV"]}


def summarize(metric_cal, num_classes):
    """metric_cal[class][case] = (dice, hd95) -> per-class mean/std + mean."""
    rows = []
    total = np.zeros(2)
    for ci in range(num_classes - 1):
        arr = np.asarray(metric_cal[ci], np.float64)
        m, s = arr.mean(axis=0), arr.std(axis=0)
        rows.append((m[0], s[0], m[1], s[1]))
        total += m
    total /= max(num_classes - 1, 1)
    return rows, (total[0], total[1])


def print_side_by_side(num_classes, ours, theirs=None):
    names = CLASS_NAMES.get(num_classes,
                            [str(i) for i in range(1, num_classes)])
    rows_o, mean_o = summarize(ours, num_classes)
    if theirs is None:
        print(f"{'class':>6} | {'dice':>14} | {'hd95':>14}")
        for n, (d, ds, h, hs) in zip(names, rows_o):
            print(f"{n:>6} | {d:8.4f}±{ds:.3f} | {h:8.3f}±{hs:.3f}")
        print(f"{'MEAN':>6} | {mean_o[0]:14.4f} | {mean_o[1]:14.3f}")
        return {"icl_tpu": {"dice": mean_o[0], "hd95": mean_o[1]}}

    rows_t, mean_t = summarize(theirs, num_classes)
    print(f"{'class':>6} | {'icl_tpu dice':>12} {'torch dice':>12} "
          f"{'Δ':>9} | {'icl_tpu hd95':>12} {'torch hd95':>12} {'Δ':>9}")
    max_dd = max_dh = 0.0
    for n, ro, rt in zip(names, rows_o, rows_t):
        dd, dh = abs(ro[0] - rt[0]), abs(ro[2] - rt[2])
        max_dd, max_dh = max(max_dd, dd), max(max_dh, dh)
        print(f"{n:>6} | {ro[0]:12.4f} {rt[0]:12.4f} {dd:9.2e} | "
              f"{ro[2]:12.3f} {rt[2]:12.3f} {dh:9.2e}")
    print(f"{'MEAN':>6} | {mean_o[0]:12.4f} {mean_t[0]:12.4f} "
          f"{abs(mean_o[0] - mean_t[0]):9.2e} | {mean_o[1]:12.3f} "
          f"{mean_t[1]:12.3f} {abs(mean_o[1] - mean_t[1]):9.2e}")
    return {
        "icl_tpu": {"dice": mean_o[0], "hd95": mean_o[1]},
        "torch_reference": {"dice": mean_t[0], "hd95": mean_t[1]},
        "max_class_delta": {"dice": max_dd, "hd95": max_dh},
    }


# ----------------------------------------------------------------- main
def run(args) -> dict:
    from icl_tpu.utils.torch_import import load_torch_state_dict

    dim = MODEL_FAMILIES[args.model][0]
    if args.patch_size is None:
        if dim == "3d":
            patch = (96, 96, 96)
        else:
            patch = (224, 224) if "swin" in args.model else (256, 256)
    else:
        patch = tuple(args.patch_size)

    tmp = None
    if args.synthetic:
        tmp = tempfile.TemporaryDirectory(prefix="parity_synth_")
        args.root_path = tmp.name
        if args.dataset == "ACDC":
            build_synthetic_acdc(tmp.name)
        else:
            build_synthetic_brats(tmp.name)
        args.torch_ckpt = os.path.join(tmp.name, "model_best.pth")
        make_synthetic_ckpt(args.model, args.num_classes, args.torch_ckpt)
    if not args.root_path or not args.torch_ckpt:
        raise SystemExit("--root_path and --torch_ckpt required "
                         "(or use --synthetic)")

    sd = load_torch_state_dict(args.torch_ckpt)
    model, variables = build_jax(args.model, args.num_classes, patch, sd)

    want_torch = args.torch_side == "on" or (
        args.torch_side == "auto" and reference_importable())
    t_net = None
    if want_torch:
        import torch

        t_net = build_reference_net(args.model, args.num_classes)
        t_net.load_state_dict(
            {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)

    if args.dataset == "ACDC":
        from icl_tpu.data.acdc import ACDCDataset
        from icl_tpu.eval.infer2d import make_slice_predictor

        db = ACDCDataset(args.root_path, "val_test", cache=False)
        if args.limit:
            db.sample_list = db.sample_list[: args.limit]
        predict = make_slice_predictor(model, patch)
        # collect the raw per-case table (not the aggregated dict) so the
        # side-by-side can report per-class deltas
        ours = _collect(predict, variables, db, args.num_classes)
        theirs = (_collect(torch_predictor_2d(t_net, patch), None, db,
                           args.num_classes) if t_net is not None else None)
    else:
        from icl_tpu.data.brats import BraTS2019Dataset
        from icl_tpu.eval.infer3d import evaluate_brats_cases, make_patch_predictor

        db = BraTS2019Dataset(args.root_path, "val_test")
        if args.limit:
            db.image_list = db.image_list[: args.limit]
        probs_fn = make_patch_predictor(model, patch, sw_batch=4)
        ours = evaluate_brats_cases(probs_fn, variables, db,
                                    args.num_classes, patch)
        theirs = (evaluate_brats_cases(torch_probs_fn_3d(t_net), None, db,
                                       args.num_classes, patch)
                  if t_net is not None else None)

    result = print_side_by_side(args.num_classes, ours, theirs)
    result.update(dataset=args.dataset, model=args.model,
                  checkpoint=args.torch_ckpt, cases=len(db))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=2)
    if tmp is not None:
        tmp.cleanup()
    return result


def _collect(predict, variables, dataset, num_classes):
    from icl_tpu.metrics import calculate_metric_percase

    metric_cal = [[] for _ in range(num_classes - 1)]
    for i in range(len(dataset)):
        item = dataset[i]
        pred = predict(variables, item["image"])
        for cls in range(1, num_classes):
            metric_cal[cls - 1].append(
                calculate_metric_percase(pred == cls, item["label"] == cls))
    return metric_cal


if __name__ == "__main__":
    run(parse_args())
