"""Numerical parity of the ICL Query_Attention quirks vs a torch oracle
built from the reference formulas (unet_icl.py:364-390). The head-reshape
quirk ([B,cls,C] -> [B,H,cls,C/H] with no transpose) must match exactly."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from icl_tpu.models.icl import QueryAttention


def torch_query_attention_oracle(q, x, Wq, bq, Wkv, bkv, Wp, bp, num_heads):
    """Reference math (unet_icl.py:377-390) with explicit weights."""
    B, N, C = x.shape
    ncls = q.shape[1]
    hd = C // num_heads
    scale = hd ** -0.5
    qp = (q @ Wq.T + bq).reshape(B, num_heads, ncls, hd)
    kv = (x @ Wkv.T + bkv).reshape(B, N, 2, num_heads, hd).permute(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]
    attn1 = (qp @ k.transpose(-2, -1)) * scale
    attn2 = attn1.softmax(dim=-1)
    out = (attn2 @ v).reshape(B, ncls, C)
    out = out @ Wp.T + bp
    return out, attn1.permute(0, 2, 1, 3)


def test_query_attention_matches_reference_math():
    rng = np.random.default_rng(0)
    B, N, C, H, ncls = 2, 12, 16, 4, 3
    q = rng.normal(size=(B, ncls, C)).astype(np.float32)
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    Wq = rng.normal(size=(C, C), scale=0.2).astype(np.float32)
    bq = rng.normal(size=(C,), scale=0.1).astype(np.float32)
    Wkv = rng.normal(size=(2 * C, C), scale=0.2).astype(np.float32)
    bkv = rng.normal(size=(2 * C,), scale=0.1).astype(np.float32)
    Wp = rng.normal(size=(C, C), scale=0.2).astype(np.float32)
    bp = rng.normal(size=(C,), scale=0.1).astype(np.float32)

    want_out, want_attn = torch_query_attention_oracle(
        *(torch.from_numpy(a) for a in (q, x, Wq, bq, Wkv, bkv, Wp, bp)), H
    )

    qa = QueryAttention(dim=C, num_heads=H)
    params = {
        "fc_q": {"Dense_0": {"kernel": jnp.asarray(Wq.T), "bias": jnp.asarray(bq)}},
        "fc_kv": {"Dense_0": {"kernel": jnp.asarray(Wkv.T), "bias": jnp.asarray(bkv)}},
        "proj": {"Dense_0": {"kernel": jnp.asarray(Wp.T), "bias": jnp.asarray(bp)}},
    }
    got_out, got_attn = qa.apply({"params": params}, jnp.asarray(q), jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(got_out), want_out.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_attn), want_attn.numpy(), atol=1e-5)


def test_query_attention_param_tree_shape():
    qa = QueryAttention(dim=16, num_heads=4)
    v = qa.init(jax.random.key(0), jnp.zeros((1, 3, 16)), jnp.zeros((1, 8, 16)))
    flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("fc_q" in n for n in names)
    assert any("fc_kv" in n for n in names)
    assert any("proj" in n for n in names)
