"""SwinUNETR 3D, channel-last (NDHWC), Flax.

TPU-native rebuild of the reference's vendored MONAI SwinUNETR
(`code/networks/swinunetr.py:29-285` wrapper, `:387-1010` 3D Swin
transformer). Differences from the 2D Swin-UNet:

  * patch 2³ conv embed; stages at C, 2C, 4C, 8C, 16C with
    PatchMerging after EVERY stage (including the last).
  * Multi-scale hidden states are LayerNorm'd (no affine) per scale
    (`proj_out`, swinunetr.py:950-965) and fed to UNETR conv
    encoder/decoder blocks (instance norm + leaky-relu residual blocks).
  * Window 7³ with pad-to-multiple + crop; per-dim window shrink when a
    stage dim ≤ window (get_window_size, swinunetr.py:359-384).
  * The reference's PatchMerging has MONAI's known duplicated-slice
    quirk (x5/x6 repeat x2/x3, dropping neighbors [1,1,0] and [0,1,1],
    swinunetr.py:689-722) — preserved for checkpoint parity.

Kept channel-last end-to-end: the reference rearranges NCDHW↔NDHWC
around every stage (swinunetr.py:830-860); here there is nothing to
rearrange.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from icl_tpu.models.layers import DropPath, TorchConv, gelu_exact
from icl_tpu.models.swin2d import SwinDense, SwinLayerNorm, trunc_normal_init
from icl_tpu.models.unet3d import InstanceNorm


def get_window_size_3d(dims, window, shift):
    """Per-dim shrink when dim ≤ window (swinunetr.py:359-384)."""
    ws, ss = list(window), list(shift)
    for i, d in enumerate(dims):
        if d <= window[i]:
            ws[i] = d
            ss[i] = 0
    return tuple(ws), tuple(ss)


def window_partition_3d(x: jax.Array, ws) -> jax.Array:
    B, D, H, W, C = x.shape
    x = x.reshape(B, D // ws[0], ws[0], H // ws[1], ws[1], W // ws[2], ws[2], C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, ws[0] * ws[1] * ws[2], C)


def window_reverse_3d(windows: jax.Array, ws, dims) -> jax.Array:
    B, D, H, W = dims
    C = windows.shape[-1]
    x = windows.reshape(B, D // ws[0], H // ws[1], W // ws[2], ws[0], ws[1], ws[2], C)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D, H, W, C)


def relative_position_index_3d(ws) -> np.ndarray:
    """3D pairwise relative-position index (swinunetr.py:414-436)."""
    coords = np.stack(
        np.meshgrid(*[np.arange(w) for w in ws], indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    for i in range(3):
        rel[:, :, i] += ws[i] - 1
    rel[:, :, 0] *= (2 * ws[1] - 1) * (2 * ws[2] - 1)
    rel[:, :, 1] *= 2 * ws[2] - 1
    return rel.sum(-1)


def window_region_ids_3d(dims, ws, ss) -> Optional[np.ndarray]:
    """Per-window-token shift-region ids [nW, N] (the `mw` intermediate
    of the reference's compute_mask, swinunetr.py:724-752), or None when
    no dim shifts. The full [nW, N, N] mask is synthesized ON DEVICE
    from these (mask_from_region_ids) — embedding the cube as an HLO
    constant is ~161MB for the 96³ stage-1 shape and overflows compile
    RPC payloads; the ids are N³-fold smaller."""
    if not any(s > 0 for s in ss):
        return None
    D, H, W = dims
    img_mask = np.zeros((1, D, H, W, 1), np.float32)
    cnt = 0
    for d in (slice(-ws[0]), slice(-ws[0], -ss[0]), slice(-ss[0], None)):
        for h in (slice(-ws[1]), slice(-ws[1], -ss[1]), slice(-ss[1], None)):
            for w in (slice(-ws[2]), slice(-ws[2], -ss[2]), slice(-ss[2], None)):
                img_mask[:, d, h, w, :] = cnt
                cnt += 1
    mw = img_mask.reshape(1, D // ws[0], ws[0], H // ws[1], ws[1], W // ws[2], ws[2], 1)
    return mw.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        -1, ws[0] * ws[1] * ws[2]
    ).astype(np.float32)


def mask_from_region_ids(mw: jax.Array) -> jax.Array:
    """[nW, N] region ids -> additive attention mask [nW, N, N]
    (reference swinunetr.py:753-760 semantics)."""
    diff = mw[:, None, :] - mw[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0).astype(jnp.float32)


def compute_mask_3d(dims, ws, ss) -> Optional[np.ndarray]:
    """Shifted-window attention mask (swinunetr.py:724-760), host numpy.
    Kept for oracles/tests; the scanned stage uses the region-id form."""
    mw = window_region_ids_3d(dims, ws, ss)
    if mw is None:
        return None
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention3D(nn.Module):
    """3D W-MSA with relative position bias (swinunetr.py:387-494)."""

    dim: int
    window_size: Sequence[int]
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray] = None,
                 region_ids: Optional[jax.Array] = None):
        """`mask` is a dense [nW, N, N] additive mask; `region_ids`
        ([nW, N], mutually exclusive) are shift-region ids from which
        the mask is derived (mask_from_region_ids) — on the Pallas path
        the derivation happens in-kernel, so the dense cube never exists
        in HBM.

        `window_size` is the CONFIGURED window (7³), not the per-stage
        effective one: the reference constructs every stage's attention
        with the full window — the bias table stays (2·7−1)³ = 2197 rows
        in every stage and small stages slice
        `relative_position_index[:n, :n]` of the 7³-ordering index
        (swinunetr.py:422-424,480-482), NOT the index of the shrunk
        window. Verified against the real reference module in
        tests/test_reference_parity.py (round-3 fix: the shrunk-window
        table both diverged numerically whenever a stage dim < 7 and
        broke checkpoint interop shapes)."""
        B_, N, C = x.shape
        H = self.num_heads
        hd = C // H
        scale = hd**-0.5
        ws = self.window_size

        table_size = (2 * ws[0] - 1) * (2 * ws[1] - 1) * (2 * ws[2] - 1)
        bias_table = self.param(
            "relative_position_bias_table", trunc_normal_init(), (table_size, H)
        )
        rpi = relative_position_index_3d(ws)[:N, :N]

        qkv = SwinDense(3 * C, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(B_, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        rel_bias = bias_table[rpi.reshape(-1)].reshape(N, N, H).transpose(2, 0, 1)

        from icl_tpu.ops.flags import pallas_interpret, use_pallas_attention

        if use_pallas_attention():
            from icl_tpu.ops.pallas.window_attention import window_attention_fused

            m = jnp.asarray(mask) if mask is not None else None
            out = window_attention_fused(q, k, v, rel_bias, m, region_ids,
                                         scale=scale,
                                         interpret=pallas_interpret())
        else:
            if region_ids is not None and mask is None:
                mask = mask_from_region_ids(region_ids)
            attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k) + rel_bias[None]
            if mask is not None:
                nW = mask.shape[0]
                attn = attn.reshape(B_ // nW, nW, H, N, N) + jnp.asarray(mask)[None, :, None]
                attn = attn.reshape(B_, H, N, N)
            attn = nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return SwinDense(C, name="proj")(out)


def drop_path_traced(x, rate, rng, train: bool):
    """DropPath with a TRACED rate (scan-friendly; rate is a scanned
    per-block input). Matches models.layers.DropPath numerics: with
    rate 0 the Bernoulli mask is all-True and x/1.0 is exact."""
    if not train:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class SwinBlock3DScanBody(nn.Module):
    """Shape-uniform 3D Swin block body for `nn.scan` over a stage's
    same-shape blocks (VERDICT r1 item 2: the unrolled per-block HLO put
    the 3D Swin step at ~10 min compile).

    Per-block differences become scanned INPUTS instead of distinct HLO:
      * shift_flag (0./1.) — cyclic shift via jnp.roll with a traced
        shift (flag · window//2); identical to the static roll.
      * dp_rate            — traced DropPath rate (dpr ramp per block).
    The shifted-window mask is synthesized in-body from broadcast
    region ids (mask_from_region_ids · flag) — zero for unshifted
    blocks, numerically identical to the reference's None path, and
    N³-fold smaller as an HLO constant.

    Numerics are bit-identical to the unrolled SwinBlock3D: same pad →
    roll → window partition → attention(+bias, +mask) → reverse → crop
    → residual/MLP sequence (reference swinunetr.py:496-660)."""

    dim: int
    num_heads: int
    window_size: Sequence[int]  # effective (shrunk) per-stage ws
    base_shift: Sequence[int]   # shrunk shift; roll skipped if all-zero
    table_window: Sequence[int] = (7, 7, 7)  # configured ws: sizes the
    # rel-pos bias table + index (reference keeps the full-window table
    # in every stage and slices [:N, :N] — see WindowAttention3D)
    mlp_ratio: float = 4.0
    train: bool = False

    @nn.compact
    def __call__(self, x, scanned, region_ids):
        shift_flag, dp_rate = scanned
        train = self.train
        B, D, Hd, W, C = x.shape
        ws, ss = self.window_size, self.base_shift

        shortcut = x
        h = SwinLayerNorm(name="norm1")(x)
        pads = [(0, (w - d % w) % w) for d, w in zip((D, Hd, W), ws)]
        if any(p[1] for p in pads):
            h = jnp.pad(h, [(0, 0)] + pads + [(0, 0)])
        dp_, hp_, wp_ = h.shape[1:4]

        do_shift = any(s > 0 for s in ss)
        if do_shift:
            roll = tuple(-(shift_flag * s) for s in ss)
            h = jnp.roll(h, shift=roll, axis=(1, 2, 3))
            # flag-scaled region ids: diff(flag·mw) ≠ 0 ⟺ flag=1 ∧
            # diff(mw) ≠ 0, so the derived mask is exactly flag·mask
            rids = region_ids * shift_flag.astype(region_ids.dtype)
        else:
            rids = None

        windows = window_partition_3d(h, ws)
        attn_windows = WindowAttention3D(
            C, self.table_window, self.num_heads, name="attn"
        )(windows, region_ids=rids)
        h = window_reverse_3d(attn_windows, ws, (h.shape[0], dp_, hp_, wp_))
        if do_shift:
            h = jnp.roll(h, shift=tuple(shift_flag * s for s in ss), axis=(1, 2, 3))
        h = h[:, :D, :Hd, :W, :]

        rng1 = self.make_rng("dropout") if train else None
        x = shortcut + drop_path_traced(h, dp_rate, rng1, train)
        hidden = int(C * self.mlp_ratio)
        mlp = SwinDense(hidden, name="mlp_linear1")
        mlp2 = SwinDense(C, name="mlp_linear2")
        y = mlp2(gelu_exact(mlp(SwinLayerNorm(name="norm2")(x))))
        rng2 = self.make_rng("dropout") if train else None
        x = x + drop_path_traced(y, dp_rate, rng2, train)
        return x, None


class SwinStage3D(nn.Module):
    """One Swin stage = lax.scan over `depth` same-shape blocks with
    stacked params (leading axis = block index). Halves-to-quarters the
    stage HLO vs the unrolled loop; the torch converters stack the
    per-block reference weights along axis 0 (convert_swinvit3d)."""

    dim: int
    depth: int
    num_heads: int
    window_size: Sequence[int] = (7, 7, 7)
    drop_paths: Sequence[float] = ()
    mlp_ratio: float = 4.0
    remat: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        B, D, Hd, W, C = x.shape
        ws, ss = get_window_size_3d(
            (D, Hd, W), self.window_size,
            tuple(w // 2 for w in self.window_size),
        )
        padded = tuple(d + (w - d % w) % w for d, w in zip((D, Hd, W), ws))

        region_ids = window_region_ids_3d(padded, ws, ss)  # [nW, N] or None
        if region_ids is None:
            # no dim shifts at this stage: keep ss consistent so the
            # body takes the mask-free path
            ss = (0, 0, 0)
            region_ids = np.zeros((1, 1), np.float32)  # unused broadcast
        flags = [1 if b % 2 == 1 else 0 for b in range(self.depth)]
        rates = [self.drop_paths[b] if self.drop_paths else 0.0
                 for b in range(self.depth)]
        scanned = (
            jnp.asarray(flags, jnp.int32),
            jnp.asarray(rates, jnp.float32),
        )

        body = SwinBlock3DScanBody
        if self.remat:
            body = nn.remat(body)
        Blocks = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0, nn.broadcast),
            length=self.depth,
        )
        x, _ = Blocks(
            self.dim, self.num_heads, ws, ss, tuple(self.window_size),
            self.mlp_ratio, train,
            name="blocks",
        )(x, scanned, jnp.asarray(region_ids))
        return x


class SwinBlock3D(nn.Module):
    """3D Swin block with pad-to-window + crop (swinunetr.py:496-660).
    Reference (unrolled) implementation — kept as the numerical oracle
    for the scanned stage (tests/test_swin_scan.py) and for single-block
    use."""

    dim: int
    num_heads: int
    window_size: Sequence[int] = (7, 7, 7)
    shift_size: Sequence[int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, D, Hd, W, C = x.shape
        ws, ss = get_window_size_3d((D, Hd, W), self.window_size, self.shift_size)

        shortcut = x
        h = SwinLayerNorm(name="norm1")(x)
        pads = [(0, (w - d % w) % w) for d, w in zip((D, Hd, W), ws)]
        if any(p[1] for p in pads):
            h = jnp.pad(h, [(0, 0)] + pads + [(0, 0)])
        dp_, hp_, wp_ = h.shape[1:4]

        if any(s > 0 for s in ss):
            h = jnp.roll(h, shift=tuple(-s for s in ss), axis=(1, 2, 3))
        mask = compute_mask_3d((dp_, hp_, wp_), ws, ss)

        windows = window_partition_3d(h, ws)
        attn_windows = WindowAttention3D(
            C, self.window_size, self.num_heads, name="attn"
        )(windows, mask=mask)
        h = window_reverse_3d(attn_windows, ws, (h.shape[0], dp_, hp_, wp_))
        if any(s > 0 for s in ss):
            h = jnp.roll(h, shift=ss, axis=(1, 2, 3))
        h = h[:, :D, :Hd, :W, :]

        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(h, train)
        hidden = int(C * self.mlp_ratio)
        mlp = SwinDense(hidden, name="mlp_linear1")
        mlp2 = SwinDense(C, name="mlp_linear2")
        y = mlp2(gelu_exact(mlp(SwinLayerNorm(name="norm2")(x))))
        x = x + dp(y, train)
        return x


class PatchMerging3D(nn.Module):
    """8-neighbor concat + LN + Linear 8C→2C, WITH the reference's
    duplicated-slice quirk (x5=x2, x6=x3; swinunetr.py:689-712)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        pads = [(0, D % 2), (0, H % 2), (0, W % 2)]
        if any(p[1] for p in pads):
            x = jnp.pad(x, [(0, 0)] + pads + [(0, 0)])
        s = lambda a, b, c: x[:, a::2, b::2, c::2, :]
        # Reference order: (0,0,0),(1,0,0),(0,1,0),(0,0,1),(1,0,1),
        # then DUPLICATES (0,1,0),(0,0,1), then (1,1,1).
        parts = [
            s(0, 0, 0), s(1, 0, 0), s(0, 1, 0), s(0, 0, 1),
            s(1, 0, 1), s(0, 1, 0), s(0, 0, 1), s(1, 1, 1),
        ]
        x = jnp.concatenate(parts, axis=-1)
        x = SwinLayerNorm(name="norm")(x)
        return SwinDense(2 * self.dim, use_bias=False, name="reduction")(x)


def layer_norm_no_affine(x):
    """proj_out's parameterless F.layer_norm over channels
    (swinunetr.py:950-965)."""
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


class SwinViT3D(nn.Module):
    """MONAI-style 3D Swin encoder emitting 5 per-scale hidden states
    (swinunetr.py:863-1010)."""

    in_chans: int
    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: Sequence[int] = (7, 7, 7)
    drop_path_rate: float = 0.0
    normalize: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        # PatchEmbed: conv k=s=2 (torch default init)
        x = TorchConv(self.embed_dim, (2, 2, 2), strides=(2, 2, 2),
                      name="patch_embed_proj")(x)
        outs = [layer_norm_no_affine(x) if self.normalize else x]
        for i in range(len(self.depths)):
            dim = self.embed_dim * 2**i
            # lax.scan over the stage's same-shape blocks (stacked
            # params under layers{i+1}_blocks/blocks); block-level remat
            # composes inside the scan body (the reference plumbs
            # use_checkpoint per block, swinunetr_icl.py:905-915).
            x = SwinStage3D(
                dim, self.depths[i], self.num_heads[i], self.window_size,
                drop_paths=tuple(
                    dpr[sum(self.depths[:i]) + b] for b in range(self.depths[i])
                ),
                remat=self.remat,
                name=f"layers{i + 1}_blocks",
            )(x, train=train)
            x = PatchMerging3D(dim, name=f"layers{i + 1}_downsample")(x)
            outs.append(layer_norm_no_affine(x) if self.normalize else x)
        return outs


class UnetResBlock(nn.Module):
    """MONAI UnetResBlock: conv-norm-lrelu / conv-norm (+1×1 residual)
    -lrelu, instance norm, bias-free convs."""

    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = (self.kernel,) * 3
        out = TorchConv(self.features, k, strides=(self.stride,) * 3,
                        padding=self.kernel // 2, use_bias=False, name="conv1")(x)
        out = InstanceNorm(name="norm1")(out)
        out = nn.leaky_relu(out, 0.01)
        out = TorchConv(self.features, k, padding=self.kernel // 2,
                        use_bias=False, name="conv2")(out)
        out = InstanceNorm(name="norm2")(out)
        residual = x
        if cin != self.features or self.stride != 1:
            residual = TorchConv(self.features, (1, 1, 1),
                                 strides=(self.stride,) * 3, use_bias=False,
                                 name="conv3")(x)
            residual = InstanceNorm(name="norm3")(residual)
        return nn.leaky_relu(out + residual, 0.01)


class UnetrUpBlock(nn.Module):
    """Transposed-conv 2× upsample + concat [up, skip] + UnetResBlock."""

    features: int

    @nn.compact
    def __call__(self, x, skip):
        from icl_tpu.models.layers import TorchConvTranspose

        # MONAI's transp_conv is bias-free (dynunet_block.get_conv_layer
        # default bias=False; the reference's UnetrUpBlock uses
        # conv_only=True, swinunetr.py:176-223)
        up = TorchConvTranspose(self.features, (2, 2, 2), (2, 2, 2),
                                use_bias=False, name="transp_conv")(x)
        out = jnp.concatenate([up, skip], axis=-1)
        return UnetResBlock(self.features, name="conv_block")(out)


class SwinUNETR(nn.Module):
    """Reference SwinUNETR forward graph (swinunetr.py:279-293).
    `return_feats` yields the ICL taps [dec3, dec2, dec1, dec0]."""

    in_chns: int
    class_num: int
    feature_size: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: Sequence[int] = (7, 7, 7)
    drop_path_rate: float = 0.0
    return_feats: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False, inference: bool = False):
        fs = self.feature_size
        Res = nn.remat(UnetResBlock) if self.remat else UnetResBlock
        Up = nn.remat(UnetrUpBlock) if self.remat else UnetrUpBlock
        hs = SwinViT3D(
            self.in_chns, fs, self.depths, self.num_heads, self.window_size,
            self.drop_path_rate, remat=self.remat, name="swinViT",
        )(x, train=train)
        enc0 = Res(fs, name="encoder1")(x)
        enc1 = Res(fs, name="encoder2")(hs[0])
        enc2 = Res(2 * fs, name="encoder3")(hs[1])
        enc3 = Res(4 * fs, name="encoder4")(hs[2])
        dec4 = Res(16 * fs, name="encoder10")(hs[4])
        dec3 = Up(8 * fs, name="decoder5")(dec4, hs[3])
        dec2 = Up(4 * fs, name="decoder4")(dec3, enc3)
        dec1 = Up(2 * fs, name="decoder3")(dec2, enc2)
        dec0 = Up(fs, name="decoder2")(dec1, enc1)
        out = Up(fs, name="decoder1")(dec0, enc0)
        logits = TorchConv(self.class_num, (1, 1, 1), name="out")(out)
        if self.return_feats:
            return logits, [dec3, dec2, dec1, dec0]
        return logits
