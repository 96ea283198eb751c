"""Inherent Consistent Learning heads (SSPA / USCL), channel-last, Flax.

One shared implementation of the reference's `InherentConsistent` +
`Class_Decoder` + `Query_Attention` stack, which the reference
duplicates 4× (unet_icl.py:254-408, unet_3D_icl.py:155-315,
vision_transformer.py:193-353, swinunetr_icl.py:359-520). Parameterized
by `spatial_dims` (2/3) and `tokenized_input` (the Swin 2D variant feeds
token features directly, vision_transformer.py:245-247).

Reference quirks preserved deliberately (SURVEY.md §7 "hard parts"):
  * `Query_Attention` reshapes the projected query [B, cls, C] straight
    to [B, heads, cls, C/heads] (row-major, no transpose) and the
    attended value [B, heads, cls, C/heads] straight back to [B, cls, C]
    (unet_icl.py:380,386) — heads interleave class/channel. Row-major
    reshape semantics are identical in JAX.
  * The pre-softmax attention logits are the per-class segmentation
    output, LayerNorm+MLP'd over the token axis (unet_icl.py:354-361).
  * `Class_Decoder` applies a *self*-residual `q = q + drop_path(q)`
    (unet_icl.py:358) — kept for parity.
  * The learned global query `guided_Q` initializes to zeros
    (unet_icl.py:298).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from icl_tpu.models.layers import (
    BatchNorm,
    DropPath,
    LayerNorm,
    TorchConv,
    TorchDense,
    gelu_exact,
)


class MLP(nn.Module):
    """fc1 → GELU → fc2 (unet_icl.py:392-408; dropout rate is 0 in every
    reference config, so omitted)."""

    hidden_features: int
    out_features: int

    @nn.compact
    def __call__(self, x):
        x = TorchDense(self.hidden_features, name="fc1")(x)
        x = gelu_exact(x)
        x = TorchDense(self.out_features, name="fc2")(x)
        return x


class QueryAttention(nn.Module):
    """Cross-attention from class queries to feature tokens, also
    emitting the pre-softmax attention logits (unet_icl.py:364-390)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, q, x):
        B, N, C = x.shape
        num_classes = q.shape[1]
        head_dim = C // self.num_heads
        scale = head_dim**-0.5

        q = TorchDense(C, use_bias=self.qkv_bias, name="fc_q")(q)
        # Reference quirk: straight reshape [B, cls, C]→[B, H, cls, C/H].
        q = q.reshape(B, self.num_heads, num_classes, head_dim)
        kv = TorchDense(2 * C, use_bias=self.qkv_bias, name="fc_kv")(x)
        kv = kv.reshape(B, N, 2, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]  # [B, H, N, C/H]

        attn1 = jnp.einsum("bhcd,bhnd->bhcn", q, k) * scale  # [B, H, cls, N]
        attn2 = nn.softmax(attn1, axis=-1)
        out = jnp.einsum("bhcn,bhnd->bhcd", attn2, v)
        # Reference quirk: straight reshape back to [B, cls, C].
        out = out.reshape(B, num_classes, C)
        out = TorchDense(C, name="proj")(out)
        attn = attn1.transpose(0, 2, 1, 3)  # [B, cls, H, N] pre-softmax logits
        return out, attn


class ClassDecoder(nn.Module):
    """Pre-norm cross-attention block over class queries; the attention
    map itself gets a LayerNorm(N)+MLP(N) residual (unet_icl.py:340-362)."""

    dim: int
    n_patch: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, query, feat, *, train: bool):
        dp = DropPath(self.drop_path, name="drop_path")
        q_out, attn = QueryAttention(self.dim, self.num_heads, name="attn")(
            LayerNorm(name="norm1_query")(query), LayerNorm(name="norm1")(feat)
        )
        # Self-residual quirk (reference :358): query := attn_out + dp(attn_out)
        query = q_out + dp(q_out, train)
        query = query + dp(
            MLP(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(
                LayerNorm(name="norm2")(query)
            ),
            train,
        )
        attn = attn + dp(attn, train)
        attn = attn + dp(
            MLP(self.n_patch, self.n_patch, name="mlp2")(
                LayerNorm(name="norm3")(attn)
            ),
            train,
        )
        return query, attn


class SeparableConv(nn.Module):
    """Depthwise 3^d conv + BN + ReLU + pointwise 1^d conv + BN + ReLU
    (relu_first=False variant, unet_icl.py:98-126 — the one every ICL
    config instantiates). Channel-last, no biases."""

    features: int
    spatial_dims: int = 2

    @nn.compact
    def __call__(self, x, *, train: bool):
        cin = x.shape[-1]
        k = (3,) * self.spatial_dims
        x = TorchConv(
            cin, k, padding=1, use_bias=False, feature_group_count=cin,
            name="depthwise",
        )(x)
        x = BatchNorm(name="bn_depth")(x, train)
        x = nn.relu(x)
        x = TorchConv(
            self.features, (1,) * self.spatial_dims, use_bias=False,
            name="pointwise",
        )(x)
        x = BatchNorm(name="bn_point")(x, train)
        x = nn.relu(x)
        return x


class InherentConsistent(nn.Module):
    """Multi-scale class-decoder head (unet_icl.py:254-338).

    feats: list (len = len(in_chans)) of channel-last feature maps
    [B, *spatial, C_i]. In 'labeled' mode the learned `guided_Q` seeds
    scale 0 and is halved per scale by a pointwise conv; in 'unlabeled'
    mode the per-scale queries come from the labeled pass.

    Returns (feat_maps, updated_Qs): feat_maps are channel-last class
    maps [B, *spatial_i, num_classes]; updated_Qs are batch-averaged
    queries [1, num_classes, C_i].
    """

    in_chans: Sequence[int]
    num_classes: int
    num_heads: Sequence[int]
    input_resolution: Sequence[int]  # per-scale side length (square/cubic)
    spatial_dims: int = 2
    depths: Sequence[int] = (2, 2, 2)
    drop_path_rate: float = 0.1
    tokenized_input: bool = False  # Swin 2D variant skips the proj conv

    @nn.compact
    def __call__(self, feats, guided_Q=None, modal: str = "labeled", *, train: bool,
                 pair_split: int | None = None):
        """pair_split: when set (labeled mode only), `feats` is the
        concatenation [labeled; other] along batch with `pair_split`
        labeled samples — the two reference calls
        (`unet_icl.py:230-231`: sspa on labeled feats, then sspa on
        unlabeled feats through the same weights) fused into ONE pass so
        the class-decoder weights (1.07 GiB of the flagship's 1.15 B
        params, HBM-bandwidth-bound — docs/ROOFLINE.md §2) are read once
        per step instead of twice. Exactness is preserved per branch:
        every op up to the attention map is per-sample; the
        BatchNorm-bearing SeparableConv runs split per branch (own batch
        stats, running stats updated labeled-then-other — the reference's
        sequential-call order); updated_Qs average the labeled half only
        (the reference discards the second call's Qs)."""
        assert modal in ("labeled", "unlabeled")
        assert pair_split is None or modal == "labeled"
        num_scales = len(self.depths)
        # Stochastic-depth rule: every scale uses dpr[1]
        # (unet_icl.py:274,292 — drop_path=dpr[1]).
        dpr = np.linspace(0.0, self.drop_path_rate, sum(self.depths))
        drop_path = float(dpr[1])

        guided_Q_param = self.param(
            "guided_Q",
            nn.initializers.zeros,
            (1, self.num_classes, self.in_chans[0]),
        )

        BS = feats[0].shape[0]
        feat_maps, updated_Qs = [], []
        if modal == "labeled":
            next_Q = jnp.broadcast_to(
                guided_Q_param, (BS, self.num_classes, self.in_chans[0])
            )
        for i in range(num_scales):
            f = feats[i]
            C = self.in_chans[i]
            if self.tokenized_input:
                # Swin 2D variant: token feats go straight to the class
                # decoder — no proj conv, no norm (vision_transformer.py:
                # 245-247, commented out in the reference).
                tok = f.reshape(BS, -1, C)
            else:
                tok = TorchConv(
                    C, (1,) * self.spatial_dims, name=f"proj{i}"
                )(f).reshape(BS, -1, C)
                tok = LayerNorm(name=f"norm{i}")(tok)

            if modal == "labeled":
                q_in = next_Q
            else:
                q_in = jnp.broadcast_to(
                    guided_Q[i], (BS, self.num_classes, C)
                )

            res = self.input_resolution[i]
            n_patch = res**self.spatial_dims
            updated_Q, attn = ClassDecoder(
                dim=C,
                n_patch=n_patch,
                num_heads=self.num_heads[i],
                drop_path=drop_path,
                name=f"class_decoder{i}",
            )(q_in, tok, train=train)

            # [B, cls, H, N] → [B·cls, *spatial, H] channel-last
            bs, ncls, nheads, N = attn.shape
            spatial = (res,) * self.spatial_dims
            attn = attn.reshape(bs * ncls, nheads, *spatial)
            attn = jnp.moveaxis(attn, 1, -1)
            conv0 = SeparableConv(nheads, self.spatial_dims, name=f"attn_conv0_{i}")
            if pair_split is not None:
                # Per-branch BN: normalize each half by its own batch
                # stats and update running stats in the reference's
                # sequential order (labeled first). Rows are row-major,
                # so the labeled half is the first pair_split·ncls rows.
                s = pair_split * ncls
                attn = jnp.concatenate(
                    [conv0(attn[:s], train=train), conv0(attn[s:], train=train)], 0
                )
            else:
                attn = conv0(attn, train=train)
            fm = TorchConv(1, (1,) * self.spatial_dims, name=f"attn_conv1_{i}")(attn)
            fm = fm.reshape(bs, ncls, *spatial)
            feat_map = jnp.moveaxis(fm, 1, -1)  # [B, *spatial, cls]

            # Query halving for the next scale (Conv1d k=1 ≡ per-class
            # Dense, unet_icl.py:296,316).
            next_Q = TorchDense(C // 2, name=f"query_conv{i}")(updated_Q)

            feat_maps.append(feat_map)
            q_for_mean = (
                updated_Q[:pair_split] if pair_split is not None else updated_Q
            )
            updated_Qs.append(q_for_mean.mean(axis=0, keepdims=True))
        return feat_maps, updated_Qs


def sspa_paired(sspa, feats_lab, feats_unlab, *, train: bool):
    """Fuse the two labeled-mode `sspa` passes every ICL model makes
    (reference pattern, e.g. `unet_icl.py:230-231`) into one batched
    call. Returns (feat_maps_lab, feat_maps_consis, updated_Qs_lab) —
    exactly the tensors the two-call form produces (the second call's
    updated_Qs are discarded by every caller)."""
    b_lab = feats_lab[0].shape[0]
    feats = [jnp.concatenate([a, b], axis=0) for a, b in zip(feats_lab, feats_unlab)]
    fm_pair, updated_Qs_lab = sspa(
        feats, modal="labeled", train=train, pair_split=b_lab
    )
    fm_lab = [fm[:b_lab] for fm in fm_pair]
    fm_consis = [fm[b_lab:] for fm in fm_pair]
    return fm_lab, fm_consis, updated_Qs_lab
