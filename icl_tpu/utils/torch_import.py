"""Torch checkpoint interop.

The reference ecosystem has three checkpoint dialects (SURVEY.md §5):
  1. ICL-stripped best models: plain `state_dict` without sspa/uscl keys
     (train_…unet_2D.py:177-181) — UNet 2D/3D backbones.
  2. ImageNet Swin-T classifiers loaded into Swin-UNet with
     encoder→decoder layer mirroring (vision_transformer.py:111-146).
  3. SSL-pretrained SwinViT weights with `module.` prefixes
     (swinunetr.py:230-276 load_from; train_…swinunetr_3D_BraTS.py:77-99).

This module converts those torch state_dicts into icl_tpu Flax param
trees. Layout transforms:
    Conv:     torch (O, I, *k)   -> flax (*k, I, O)
    ConvT:    torch (I, O, *k)   -> flax (*k, I, O), spatially flipped
              (flax ConvTranspose default computes the true transposed
              conv with an un-flipped kernel; torch's equals flax's on a
              spatially-reversed kernel)
    Linear:   torch (O, I)       -> flax (I, O)
    Norms:    weight->scale, bias->bias; BN running_{mean,var} ->
              batch_stats {mean, var}
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu")
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and all(
        hasattr(v, "numpy") for v in obj["model"].values()
    ):
        obj = obj["model"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v for k, v in sd.items()
    }


# ---- leaf transforms --------------------------------------------------------
def t2f_conv(w: np.ndarray) -> np.ndarray:
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def t2f_convT(w: np.ndarray) -> np.ndarray:
    nd = w.ndim
    spatial = tuple(range(2, nd))
    w = np.flip(w, axis=spatial)
    return np.transpose(w, spatial + (0, 1))


def t2f_linear(w: np.ndarray) -> np.ndarray:
    return w.T


# ---- UNet 2D ----------------------------------------------------------------
def _convblock_entries(torch_prefix: str, flax_path: tuple):
    """ConvBlock: torch Sequential indices 0 conv / 1 bn / 4 conv / 5 bn
    (unet.py:37-45)."""
    out = []
    for t_idx, name in ((0, "conv1"), (4, "conv2")):
        out.append((f"{torch_prefix}.conv_conv.{t_idx}.weight",
                    flax_path + (name, "Conv_0", "kernel"), t2f_conv))
        out.append((f"{torch_prefix}.conv_conv.{t_idx}.bias",
                    flax_path + (name, "Conv_0", "bias"), None))
    for t_idx, name in ((1, "bn1"), (5, "bn2")):
        base = f"{torch_prefix}.conv_conv.{t_idx}"
        out.append((f"{base}.weight", flax_path + (name, "BatchNorm_0", "scale"), None))
        out.append((f"{base}.bias", flax_path + (name, "BatchNorm_0", "bias"), None))
        out.append((f"{base}.running_mean",
                    ("__bs__",) + flax_path + (name, "BatchNorm_0", "mean"), None))
        out.append((f"{base}.running_var",
                    ("__bs__",) + flax_path + (name, "BatchNorm_0", "var"), None))
    return out


def unet2d_key_table():
    """torch key -> (flax path, transform) for the reference 2D UNet
    (unet.py:90-154). Paths starting with '__bs__' land in batch_stats."""
    table = []
    enc = ("encoder",)
    table += _convblock_entries("encoder.in_conv", enc + ("in_conv",))
    for i in range(1, 5):
        table += _convblock_entries(
            f"encoder.down{i}.maxpool_conv.1", enc + (f"down{i}",)
        )
    dec = ("decoder",)
    for i in range(1, 5):
        base = f"decoder.up{i}"
        table.append((f"{base}.up.weight",
                      dec + (f"up{i}", "up", "ConvTranspose_0", "kernel"), t2f_convT))
        table.append((f"{base}.up.bias",
                      dec + (f"up{i}", "up", "ConvTranspose_0", "bias"), None))
        table += _convblock_entries(f"{base}.conv", dec + (f"up{i}", "conv"))
    table.append(("decoder.out_conv.weight",
                  dec + ("out_conv", "Conv_0", "kernel"), t2f_conv))
    table.append(("decoder.out_conv.bias",
                  dec + ("out_conv", "Conv_0", "bias"), None))
    return table


def _apply_table(sd, table):
    params: dict = {}
    batch_stats: dict = {}
    missing = []
    for t_key, f_path, tf in table:
        if t_key not in sd:
            missing.append(t_key)
            continue
        v = np.asarray(sd[t_key])
        if tf is not None:
            v = tf(v)
        target = batch_stats if f_path[0] == "__bs__" else params
        path = f_path[1:] if f_path[0] == "__bs__" else f_path
        node = target
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return params, batch_stats, missing


def convert_unet2d(sd: Dict[str, np.ndarray]):
    """Reference 2D UNet state_dict (ICL-stripped best model dialect) ->
    (params, batch_stats) subtrees for icl_tpu UNet/UNetICL."""
    sd = strip_prefix(sd, "module.")
    return _apply_table(sd, unet2d_key_table())


# ---- UNet 3D ----------------------------------------------------------------
def unet3d_key_table():
    """unet_3D (unet_3D.py:21-100): UnetConv3 Sequentials conv1/conv2 with
    [0]=Conv3d, [1]=InstanceNorm (no params). InstanceNorm is affine-free,
    so only convs map."""
    table = []

    def unetconv3(torch_prefix, flax_path):
        out = []
        for i in (1, 2):
            out.append((f"{torch_prefix}.conv{i}.0.weight",
                        flax_path + (f"conv{i}", "kernel"), t2f_conv))
            out.append((f"{torch_prefix}.conv{i}.0.bias",
                        flax_path + (f"conv{i}", "bias"), None))
        return out

    for name in ("conv1", "conv2", "conv3", "conv4", "center"):
        table += unetconv3(name, ("backbone_maybe", name))
    for i in (4, 3, 2, 1):
        table += unetconv3(f"up_concat{i}.conv", ("backbone_maybe", f"up_concat{i}", "conv"))
    table.append(("final.weight", ("backbone_maybe", "final", "kernel"), t2f_conv))
    table.append(("final.bias", ("backbone_maybe", "final", "bias"), None))
    return table


def convert_unet3d(sd: Dict[str, np.ndarray], wrapped_in_backbone: bool = False):
    """unet_3D / unet_3D_icl backbone. For UNet3DICL the backbone params
    live under 'backbone'; for plain UNet3D at the root."""
    sd = strip_prefix(sd, "module.")
    table = []
    for t_key, f_path, tf in unet3d_key_table():
        path = (("backbone",) if wrapped_in_backbone else ()) + f_path[1:]
        table.append((t_key, path, tf))
    return _apply_table(sd, table)


def _merge_into(variables_tree: dict, subtree: dict) -> dict:
    out = dict(variables_tree)
    for k, v in subtree.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge_into(out[k], v)
        else:
            out[k] = v
    return out


def overlay_state(state, params_sub: dict, batch_stats_sub: dict):
    """Overlay converted subtrees onto a TrainState (missing keys keep
    their fresh init, like the reference's strict=False loads)."""
    import jax

    new_params = _merge_into(jax.device_get(state.params), params_sub)
    new_bs = _merge_into(jax.device_get(state.batch_stats), batch_stats_sub)
    # shape check against the existing tree
    return state.replace(params=new_params, batch_stats=new_bs)


def f2t_conv(w: np.ndarray) -> np.ndarray:
    nd = w.ndim
    return np.transpose(w, (nd - 1, nd - 2) + tuple(range(nd - 2)))


def f2t_convT(w: np.ndarray) -> np.ndarray:
    nd = w.ndim
    w = np.transpose(w, (nd - 2, nd - 1) + tuple(range(nd - 2)))
    return np.flip(w, axis=tuple(range(2, nd)))


def export_unet2d(params: dict, batch_stats: dict) -> Dict[str, np.ndarray]:
    """Inverse of convert_unet2d: icl_tpu UNet params → reference-dialect
    torch state_dict (numpy values; wrap with torch.from_numpy to save a
    .pth loadable by the reference's test scripts)."""
    inverse = {None: lambda v: v, t2f_conv: f2t_conv, t2f_convT: f2t_convT,
               t2f_linear: lambda v: v.T}
    out: Dict[str, np.ndarray] = {}
    for t_key, f_path, tf in unet2d_key_table():
        src = batch_stats if f_path[0] == "__bs__" else params
        path = f_path[1:] if f_path[0] == "__bs__" else f_path
        node = src
        try:
            for k in path:
                node = node[k]
        except (KeyError, TypeError):
            continue
        out[t_key] = inverse[tf](np.asarray(node))
    return out


# ---- Swin dialects ----------------------------------------------------------
def imagenet_swin_remap(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Dialect-2 key surgery (vision_transformer.py:111-146): encoder
    `layers.{i}` weights are mirrored into decoder `layers_up.{3-i}`;
    classification head keys dropped. Works in torch-key space."""
    sd = {k: v for k, v in sd.items() if not k.startswith("head.")}
    full = dict(sd)
    for k, v in sd.items():
        if k.startswith("layers."):
            layer_num = 3 - int(k[7:8])
            full[f"layers_up.{layer_num}" + k[8:]] = v
    return full


def ssl_swinvit_fixup(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Dialect-3 key surgery (train_…swinunetr_3D_BraTS.py:77-99):
    strip `module.`, rename `swin_vit` -> `swinViT` style prefixes, and
    drop the `fc1/fc2` vs `linear1/linear2` mlp naming mismatch by
    normalizing to fc names."""
    sd = strip_prefix(sd, "module.")
    out = {}
    for k, v in sd.items():
        k = k.replace("swin_vit.", "")
        k = k.replace(".linear1.", ".fc1.").replace(".linear2.", ".fc2.")
        out[k] = v
    return out


def convert_swinvit3d(sd: Dict[str, np.ndarray], depths=(2, 2, 2, 2)):
    """SSL SwinViT (dialect 3) -> icl_tpu SwinViT3D param subtree
    ('swinViT' in SwinUNETR). Covers patch_embed, per-block norms/attn/
    mlp, and per-stage downsample reduction/norm."""
    sd = ssl_swinvit_fixup(sd)
    params: dict = {}

    def put(path, v):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v

    def dense(t_key, path):
        if t_key + ".weight" in sd:
            put(path + ("Dense_0", "kernel"), t2f_linear(sd[t_key + ".weight"]))
        if t_key + ".bias" in sd:
            put(path + ("Dense_0", "bias"), sd[t_key + ".bias"])

    def lnorm(t_key, path):
        if t_key + ".weight" in sd:
            put(path + ("LayerNorm_0", "scale"), sd[t_key + ".weight"])
            put(path + ("LayerNorm_0", "bias"), sd[t_key + ".bias"])

    if "patch_embed.proj.weight" in sd:
        put(("patch_embed_proj", "Conv_0", "kernel"), t2f_conv(sd["patch_embed.proj.weight"]))
        put(("patch_embed_proj", "Conv_0", "bias"), sd["patch_embed.proj.bias"])

    for li, depth in enumerate(depths):
        layer = f"layers{li + 1}"
        for b in range(depth):
            t = f"{layer}.0.blocks.{b}"
            f = f"{layer}_block{b}"
            lnorm(f"{t}.norm1", (f, "norm1"))
            lnorm(f"{t}.norm2", (f, "norm2"))
            if f"{t}.attn.relative_position_bias_table" in sd:
                put((f, "attn", "relative_position_bias_table"),
                    sd[f"{t}.attn.relative_position_bias_table"])
            dense(f"{t}.attn.qkv", (f, "attn", "qkv"))
            dense(f"{t}.attn.proj", (f, "attn", "proj"))
            dense(f"{t}.mlp.fc1", (f, "mlp_linear1"))
            dense(f"{t}.mlp.fc2", (f, "mlp_linear2"))
        t_down = f"{layer}.0.downsample"
        f_down = f"{layer}_downsample"
        if f"{t_down}.reduction.weight" in sd:
            put((f_down, "reduction", "Dense_0", "kernel"),
                t2f_linear(sd[f"{t_down}.reduction.weight"]))
        lnorm(f"{t_down}.norm", (f_down, "norm"))
    return params


def load_pretrained_swinvit(state, ckpt_path: str):
    """SSL SwinViT init for SwinUNETR(±ICL) TrainStates."""
    sd = load_torch_state_dict(ckpt_path)
    sub = convert_swinvit3d(sd)
    import jax

    params = jax.device_get(state.params)
    if "backbone" in params:  # SwinUNETRICL
        target = {"backbone": {"swinViT": sub}}
    else:
        target = {"swinViT": sub}
    return state.replace(params=_merge_into(params, target))


def convert_swinunet2d(sd: Dict[str, np.ndarray], depths=(2, 2, 2, 2)):
    """ImageNet Swin (dialect 2, after imagenet_swin_remap) -> icl_tpu
    SwinUNet2D param subtree."""
    params: dict = {}

    def put(path, v):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v

    def dense(t_key, path):
        if t_key + ".weight" in sd:
            put(path + ("Dense_0", "kernel"), t2f_linear(sd[t_key + ".weight"]))
            if t_key + ".bias" in sd:
                put(path + ("Dense_0", "bias"), sd[t_key + ".bias"])

    def lnorm(t_key, path):
        if t_key + ".weight" in sd:
            put(path + ("LayerNorm_0", "scale"), sd[t_key + ".weight"])
            put(path + ("LayerNorm_0", "bias"), sd[t_key + ".bias"])

    if "patch_embed.proj.weight" in sd:
        put(("patch_embed_proj", "Conv_0", "kernel"), t2f_conv(sd["patch_embed.proj.weight"]))
        put(("patch_embed_proj", "Conv_0", "bias"), sd["patch_embed.proj.bias"])
    lnorm("patch_embed.norm", ("patch_embed_norm",))
    lnorm("norm", ("norm",))
    lnorm("norm_up", ("norm_up",))

    def blocks(t_layer, f_prefix, depth):
        for b in range(depth):
            t = f"{t_layer}.blocks.{b}"
            f = f"{f_prefix}_block{b}"
            lnorm(f"{t}.norm1", (f, "norm1"))
            lnorm(f"{t}.norm2", (f, "norm2"))
            if f"{t}.attn.relative_position_bias_table" in sd:
                put((f, "attn", "relative_position_bias_table"),
                    sd[f"{t}.attn.relative_position_bias_table"])
            dense(f"{t}.attn.qkv", (f, "attn", "qkv"))
            dense(f"{t}.attn.proj", (f, "attn", "proj"))
            dense(f"{t}.mlp.fc1", (f, "mlp", "fc1"))
            dense(f"{t}.mlp.fc2", (f, "mlp", "fc2"))

    for i, depth in enumerate(depths):
        blocks(f"layers.{i}", f"layers{i}", depth)
        dense(f"layers.{i}.downsample.reduction", (f"layers{i}_downsample", "reduction"))
        lnorm(f"layers.{i}.downsample.norm", (f"layers{i}_downsample", "norm"))
        if i > 0:
            blocks(f"layers_up.{i}", f"layers_up{i}", depths[len(depths) - 1 - i])
    return params


def load_pretrained_swinunet(state, ckpt_path: str):
    """ImageNet Swin-T init for SwinUnet(±ICL) TrainStates
    (vision_transformer.py:111-146 semantics, strict=False)."""
    sd = load_torch_state_dict(ckpt_path)
    sd = imagenet_swin_remap(sd)
    sub = convert_swinunet2d(sd)
    import jax

    params = jax.device_get(state.params)
    if "swin_unet" in params:
        target = {"swin_unet": sub}
    else:
        target = sub
    # Drop converted leaves whose shapes mismatch (reference deletes them,
    # vision_transformer.py:131-137)
    def prune(dst, src):
        out = {}
        for k, v in src.items():
            if k not in dst:
                continue
            if isinstance(v, dict):
                sub_p = prune(dst[k], v)
                if sub_p:
                    out[k] = sub_p
            elif np.shape(dst[k]) == np.shape(v):
                out[k] = v
        return out

    target = prune(params, target)
    return state.replace(params=_merge_into(params, target))
