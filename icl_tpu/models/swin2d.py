"""Swin-UNet 2D (Swin-T encoder + symmetric Swin decoder), channel-last.

TPU-native rebuild of the reference `SwinTransformerSys`
(`code/networks/swinunet_icl.py:605-809` and its non-ICL twin
`swin_transformer_unet_skip_expand_decoder_sys.py`), redesigned for XLA:

  * Tokens stay in grid layout [B, H, W, C] end-to-end (no [B, L, C]
    flatten/unflatten churn); window partition is a reshape+transpose
    that XLA fuses away.
  * Relative-position indices and shifted-window attention masks are
    host-precomputed numpy constants (static shapes), not registered
    buffers recomputed per module.
  * All matmuls (qkv, attention, MLP, merge/expand projections) map onto
    the MXU; the window axis is batched.

Architecture constants (configs/swin_tiny_patch4_window7_224_lite.yaml):
embed 96, depths [2,2,2,2], heads [3,6,12,24], window 7, patch 4,
mlp_ratio 4, qkv_bias True, drop_path 0.2, patch_norm True, ape False.

Decoder: PatchExpand ×2 upsampling with skip *concatenation* + Linear
reduction (swinunet_icl.py:692-720), FinalPatchExpand_X4 + 1×1 conv head
(:725-731). `BasicLayerUp` also returns its last block output as the ICL
tap (:548-551).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from icl_tpu.models.layers import DropPath, gelu_exact


def trunc_normal_init(stddev=0.02):
    return nn.initializers.truncated_normal(stddev=stddev, lower=-2.0, upper=2.0)


class SwinDense(nn.Module):
    """Linear with the reference init: trunc_normal(0.02) kernel, zero
    bias (swinunet_icl.py:737-744 _init_weights)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=trunc_normal_init(),
            bias_init=nn.initializers.zeros,
        )(x)


class SwinLayerNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5)(x)


class Mlp(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        out = x.shape[-1]
        x = SwinDense(self.hidden, name="fc1")(x)
        x = gelu_exact(x)
        x = SwinDense(out, name="fc2")(x)
        return x


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """[B, H, W, C] -> [B·nW, ws·ws, C] (swinunet_icl.py:33-47 semantics)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(windows: jax.Array, ws: int, H: int, W: int) -> jax.Array:
    """[B·nW, ws·ws, C] -> [B, H, W, C]."""
    C = windows.shape[-1]
    B = windows.shape[0] // (H * W // ws // ws)
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def relative_position_index_2d(ws: int) -> np.ndarray:
    """Pairwise relative-position index table for a ws×ws window
    (swinunet_icl.py:95-112), as a host numpy constant."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # N, N


def shifted_window_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask [nW, N, N] with 0 / -100 for shifted windows
    (swinunet_icl.py:222-245), host-precomputed."""
    img_mask = np.zeros((1, H, W, 1), np.float32)
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for h in slices:
        for w in slices:
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, H // ws, ws, W // ws, ws, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (swinunet_icl.py:68-160)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray] = None):
        B_, N, C = x.shape
        H = self.num_heads
        hd = C // H
        scale = hd**-0.5

        bias_table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(),
            ((2 * self.window_size - 1) ** 2, H),
        )
        rpi = relative_position_index_2d(self.window_size)  # N, N constant

        qkv = SwinDense(3 * C, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(B_, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        rel_bias = bias_table[rpi.reshape(-1)].reshape(N, N, H).transpose(2, 0, 1)

        from icl_tpu.ops.flags import use_pallas_attention

        # N = 49 for window 7 — below the fused kernel's win threshold
        # (measured on-chip at 2D stage-0 shapes: einsum 4.23 ms vs
        # fused 4.52 ms; the kernel pays off from 3D window sizes,
        # N = 343: 16.6 → 7.9 ms). Keep XLA for small windows.
        if use_pallas_attention() and N >= 128:
            from icl_tpu.ops.flags import pallas_interpret
            from icl_tpu.ops.pallas.window_attention import window_attention_fused

            m = jnp.asarray(mask) if mask is not None else None
            out = window_attention_fused(q, k, v, rel_bias, m, scale=scale,
                                         interpret=pallas_interpret())
        else:
            attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k) + rel_bias[None]
            if mask is not None:
                nW = mask.shape[0]
                attn = attn.reshape(B_ // nW, nW, H, N, N) + jnp.asarray(mask)[None, :, None]
                attn = attn.reshape(B_, H, N, N)
            attn = nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return SwinDense(C, name="proj")(out)


class SwinBlock(nn.Module):
    """Swin block on grid tokens [B, H, W, C] (swinunet_icl.py:174-295):
    LN → (shifted) window attention → residual+droppath → LN → MLP."""

    dim: int
    input_resolution: Sequence[int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        if min(H, W) <= ws:
            ws, shift = min(H, W), 0  # reference :203-206

        B = x.shape[0]
        C = self.dim
        shortcut = x
        h = SwinLayerNorm(name="norm1")(x)

        if shift > 0:
            h = jnp.roll(h, shift=(-shift, -shift), axis=(1, 2))
            mask = shifted_window_mask(H, W, ws, shift)
        else:
            mask = None

        windows = window_partition(h, ws)
        attn_windows = WindowAttention(
            C, ws, self.num_heads, name="attn"
        )(windows, mask=mask)
        h = window_reverse(attn_windows, ws, H, W)

        if shift > 0:
            h = jnp.roll(h, shift=(shift, shift), axis=(1, 2))

        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(h, train)
        x = x + dp(
            Mlp(int(C * self.mlp_ratio), name="mlp")(SwinLayerNorm(name="norm2")(x)),
            train,
        )
        return x


class PatchMerging(nn.Module):
    """2×2 neighborhood concat + LN + Linear 4C→2C (swinunet_icl.py:314-355)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = SwinLayerNorm(name="norm")(x)
        return SwinDense(2 * C, use_bias=False, name="reduction")(x)


class PatchExpand(nn.Module):
    """Linear C→2C + pixel-shuffle 2× + LN(C/2) (swinunet_icl.py:363-387)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = SwinDense(2 * C, use_bias=False, name="expand")(x)
        x = x.reshape(B, H, W, 2, 2, C // 2)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, C // 2)
        return SwinLayerNorm(name="norm")(x)


class FinalPatchExpandX4(nn.Module):
    """Linear C→16C + pixel-shuffle 4× + LN(C) (swinunet_icl.py:390-415)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = SwinDense(16 * C, use_bias=False, name="expand")(x)
        x = x.reshape(B, H, W, 4, 4, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 4 * H, 4 * W, C)
        return SwinLayerNorm(name="norm")(x)


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    """swin_tiny_patch4_window7_224_lite.yaml constants."""

    img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    ape: bool = False
    # block-level gradient rematerialization (the reference's plumbed-but-
    # off use_checkpoint, swinunet_icl.py:471-472)
    remat: bool = False


class SwinUNet2D(nn.Module):
    """SwinTransformerSys equivalent. `return_feats` adds the decoder
    stage taps for ICL (dims 384/192/96 at 14²/28²/56² for 224² input).

    Output: [B, img, img, num_classes] (1×1 conv head, bias-free)."""

    num_classes: int
    cfg: SwinConfig = SwinConfig()
    return_feats: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cfg = self.cfg
        num_layers = len(cfg.depths)
        pr = cfg.img_size // cfg.patch_size  # 56
        dpr = np.linspace(0, cfg.drop_path_rate, sum(cfg.depths)).tolist()
        Block = nn.remat(SwinBlock, static_argnums=(2,)) if cfg.remat else SwinBlock

        # --- Patch embed (conv k=s=patch, torch-default init) ---
        from icl_tpu.models.layers import TorchConv

        x = TorchConv(
            cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), name="patch_embed_proj",
        )(x)  # [B, 56, 56, 96]
        if cfg.patch_norm:
            x = SwinLayerNorm(name="patch_embed_norm")(x)

        # --- Encoder ---
        skips = []
        for i in range(num_layers):
            dim = cfg.embed_dim * 2**i
            res = (pr // 2**i, pr // 2**i)
            skips.append(x)
            for b in range(cfg.depths[i]):
                x = Block(
                    dim, res, cfg.num_heads[i], cfg.window_size,
                    shift_size=0 if b % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio,
                    drop_path=dpr[sum(cfg.depths[:i]) + b],
                    name=f"layers{i}_block{b}",
                )(x, train)
            if i < num_layers - 1:
                x = PatchMerging(dim, name=f"layers{i}_downsample")(x)
        x = SwinLayerNorm(name="norm")(x)  # bottleneck [B, 7, 7, 768]

        # --- Decoder ---
        feats = []
        for i in range(num_layers):
            dim = cfg.embed_dim * 2 ** (num_layers - 1 - i)
            res = (pr // 2 ** (num_layers - 1 - i),) * 2
            if i == 0:
                x = PatchExpand(dim, name="layers_up0_expand")(x)
            else:
                x = jnp.concatenate([x, skips[num_layers - 1 - i]], axis=-1)
                x = SwinDense(dim, name=f"concat_back_dim{i}")(x)
                li = num_layers - 1 - i
                for b in range(cfg.depths[li]):
                    x = Block(
                        dim, res, cfg.num_heads[li], cfg.window_size,
                        shift_size=0 if b % 2 == 0 else cfg.window_size // 2,
                        mlp_ratio=cfg.mlp_ratio,
                        drop_path=dpr[sum(cfg.depths[:li]) + b],
                        name=f"layers_up{i}_block{b}",
                    )(x, train)
                feats.append(x.reshape(x.shape[0], -1, dim))  # ICL tap [B, L, C]
                if i < num_layers - 1:
                    x = PatchExpand(dim, name=f"layers_up{i}_expand")(x)
        x = SwinLayerNorm(name="norm_up")(x)  # [B, 56, 56, 96]

        x = FinalPatchExpandX4(cfg.embed_dim, name="up_x4")(x)
        out = TorchConv(
            self.num_classes, (1, 1), use_bias=False, name="output"
        )(x)
        if self.return_feats:
            return out, feats
        return out


class SwinUnetWrapper(nn.Module):
    """Non-ICL SwinUnet (vision_transformer_base.py:25-89): grayscale →
    3-channel repeat, plain forward. A full `cfg` (e.g. from a `--cfg`
    yaml via models.swin_config.get_swin_config) overrides the
    img_size/window_size convenience fields."""

    in_chns: int
    class_num: int
    img_size: int = 224
    window_size: int = 7
    cfg: Optional[SwinConfig] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, inference: bool = False):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        cfg = self.cfg or SwinConfig(
            img_size=self.img_size, window_size=self.window_size)
        return SwinUNet2D(self.class_num, cfg, name="swin_unet")(x, train=train)
