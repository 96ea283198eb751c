"""ClassDecoder numerics vs a torch-functional oracle built from the
documented reference formulas (unet_icl.py:340-362): pre-norm cross
attention, the self-residual, query MLP residual, and the attention-map
LayerNorm(N)+MLP(N) residual. DropPath is identity in eval."""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from icl_tpu.models.icl import ClassDecoder


def _ln(x, w, b):
    return F.layer_norm(x, (x.shape[-1],), torch.from_numpy(w), torch.from_numpy(b))


def torch_class_decoder_oracle(q, feat, p, num_heads):
    """p: dict of numpy weights keyed like the flax tree."""
    qt, ft = torch.from_numpy(q), torch.from_numpy(feat)
    B, N, C = ft.shape
    ncls = qt.shape[1]
    hd = C // num_heads
    scale = hd**-0.5

    qn = _ln(qt, p["norm1_query.w"], p["norm1_query.b"])
    fn = _ln(ft, p["norm1.w"], p["norm1.b"])
    qp = (qn @ torch.from_numpy(p["fc_q.w"]).T + torch.from_numpy(p["fc_q.b"]))
    qp = qp.reshape(B, num_heads, ncls, hd)
    kv = fn @ torch.from_numpy(p["fc_kv.w"]).T + torch.from_numpy(p["fc_kv.b"])
    kv = kv.reshape(B, N, 2, num_heads, hd).permute(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]
    attn1 = (qp @ k.transpose(-2, -1)) * scale
    out = (attn1.softmax(-1) @ v).reshape(B, ncls, C)
    out = out @ torch.from_numpy(p["proj.w"]).T + torch.from_numpy(p["proj.b"])
    attn = attn1.permute(0, 2, 1, 3)  # [B, cls, H, N]

    # residual structure (:357-361), drop_path = identity in eval
    query = out + out
    h = _ln(query, p["norm2.w"], p["norm2.b"])
    h = F.gelu(h @ torch.from_numpy(p["mlp.fc1.w"]).T + torch.from_numpy(p["mlp.fc1.b"]))
    h = h @ torch.from_numpy(p["mlp.fc2.w"]).T + torch.from_numpy(p["mlp.fc2.b"])
    query = query + h
    attn = attn + attn
    a = _ln(attn, p["norm3.w"], p["norm3.b"])
    a = F.gelu(a @ torch.from_numpy(p["mlp2.fc1.w"]).T + torch.from_numpy(p["mlp2.fc1.b"]))
    a = a @ torch.from_numpy(p["mlp2.fc2.w"]).T + torch.from_numpy(p["mlp2.fc2.b"])
    attn = attn + a
    return query.numpy(), attn.numpy()


def test_class_decoder_matches_oracle():
    rng = np.random.default_rng(0)
    B, N, C, H, ncls = 2, 9, 8, 2, 3
    q = rng.normal(size=(B, ncls, C)).astype(np.float32)
    feat = rng.normal(size=(B, N, C)).astype(np.float32)

    def w(*shape):
        return rng.normal(scale=0.2, size=shape).astype(np.float32)

    p = {
        "norm1_query.w": np.ones(C, np.float32), "norm1_query.b": w(C),
        "norm1.w": np.ones(C, np.float32), "norm1.b": w(C),
        "fc_q.w": w(C, C), "fc_q.b": w(C),
        "fc_kv.w": w(2 * C, C), "fc_kv.b": w(2 * C),
        "proj.w": w(C, C), "proj.b": w(C),
        "norm2.w": np.ones(C, np.float32), "norm2.b": w(C),
        "mlp.fc1.w": w(4 * C, C), "mlp.fc1.b": w(4 * C),
        "mlp.fc2.w": w(C, 4 * C), "mlp.fc2.b": w(C),
        "norm3.w": np.ones(N, np.float32), "norm3.b": w(N),
        "mlp2.fc1.w": w(N, N), "mlp2.fc1.b": w(N),
        "mlp2.fc2.w": w(N, N), "mlp2.fc2.b": w(N),
    }
    want_q, want_a = torch_class_decoder_oracle(q, feat, p, H)

    cd = ClassDecoder(dim=C, n_patch=N, num_heads=H, drop_path=0.02)

    def dense(key):
        return {"Dense_0": {"kernel": jnp.asarray(p[key + ".w"].T),
                            "bias": jnp.asarray(p[key + ".b"])}}

    def ln(key):
        return {"LayerNorm_0": {"scale": jnp.asarray(p[key + ".w"]),
                                "bias": jnp.asarray(p[key + ".b"])}}

    params = {
        "norm1_query": ln("norm1_query"), "norm1": ln("norm1"),
        "attn": {"fc_q": dense("fc_q"), "fc_kv": dense("fc_kv"),
                 "proj": dense("proj")},
        "norm2": ln("norm2"),
        "mlp": {"fc1": dense("mlp.fc1"), "fc2": dense("mlp.fc2")},
        "norm3": ln("norm3"),
        "mlp2": {"fc1": dense("mlp2.fc1"), "fc2": dense("mlp2.fc2")},
    }
    got_q, got_a = cd.apply({"params": params}, jnp.asarray(q), jnp.asarray(feat),
                            train=False)
    np.testing.assert_allclose(np.asarray(got_q), want_q, atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_a), want_a, atol=3e-5)
