"""Loss extras vs torch oracles (focal, entropy, kl variants)."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from icl_tpu import losses


def to_cf(x):
    axes = (0, x.ndim - 1) + tuple(range(1, x.ndim - 1))
    return torch.from_numpy(np.transpose(x, axes).copy())


def test_focal_loss_matches_torch_formula():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 6, 6, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=(4, 6, 6))
    got = float(losses.focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=2.0))

    # reference formula (losses.py:160-183): -(1-pt)^g * logpt, mean
    inp = to_cf(logits).permute(0, 2, 3, 1).reshape(-1, 3)
    tgt = torch.from_numpy(labels.reshape(-1, 1))
    logpt = F.log_softmax(inp, dim=1).gather(1, tgt).view(-1)
    pt = logpt.exp()
    want = float((-1 * (1 - pt) ** 2 * logpt).mean())
    assert abs(got - want) < 1e-5


def test_entropy_losses():
    rng = np.random.default_rng(1)
    p = np.abs(rng.normal(size=(2, 4, 4, 3))).astype(np.float32)
    p = p / p.sum(-1, keepdims=True)
    got = float(losses.entropy_loss(jnp.asarray(p), num_classes=3))
    pt = to_cf(p)
    want = float(torch.mean(-torch.sum(pt * torch.log(pt + 1e-6), dim=1) / np.log(3)))
    assert abs(got - want) < 1e-6

    got_min = float(losses.entropy_minimization(jnp.asarray(p)))
    want_min = float(torch.mean(-torch.sum(pt * torch.log(pt + 1e-6), dim=1)))
    assert abs(got_min - want_min) < 1e-6

    emap = np.asarray(losses.entropy_loss_map(jnp.asarray(p)))
    assert emap.shape == (2, 4, 4, 1)


def test_compute_kl_symmetry():
    rng = np.random.default_rng(2)
    a = [rng.normal(size=(2, 8, 3)).astype(np.float32)]
    b = [rng.normal(size=(2, 8, 3)).astype(np.float32)]
    ab = float(losses.compute_kl_loss([jnp.asarray(x) for x in a],
                                      [jnp.asarray(x) for x in b]))
    ba = float(losses.compute_kl_loss([jnp.asarray(x) for x in b],
                                      [jnp.asarray(x) for x in a]))
    assert abs(ab - ba) < 1e-6
    same = float(losses.compute_kl_loss([jnp.asarray(x) for x in a],
                                        [jnp.asarray(x) for x in a]))
    assert abs(same) < 1e-7


def test_eam_and_dice_linear():
    rng = np.random.default_rng(3)
    fms = [rng.normal(size=(2, s, s, 3)).astype(np.float32) for s in (4, 8, 16)]
    labels = rng.integers(0, 3, size=(2, 16, 16))
    v = float(losses.eam_loss(fms, jnp.asarray(labels), (16, 16)))
    assert np.isfinite(v) and v > 0

    a = np.abs(rng.normal(size=(8,))).astype(np.float32)
    b = (a > 0.5).astype(np.float32)
    got = float(losses.dice_loss_linear(jnp.asarray(a), jnp.asarray(b)))
    smooth = 1e-5
    want = 1 - (2 * float((a * b).sum()) + smooth) / (float(a.sum()) + float(b.sum()) + smooth)
    assert abs(got - want) < 1e-6
