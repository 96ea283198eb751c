"""Loss numerics vs torch-CPU oracles implementing the reference formulas
(code/utils/losses.py). torch is used here ONLY as a test oracle."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from icl_tpu import losses


def to_torch_cf(x_last):
    """channel-last numpy -> channel-first torch"""
    axes = (0, x_last.ndim - 1) + tuple(range(1, x_last.ndim - 1))
    return torch.from_numpy(np.transpose(x_last, axes).copy())


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def torch_dice_loss_squared(score, target):
    smooth = 1e-5
    intersect = torch.sum(score * target)
    y = torch.sum(target * target)
    z = torch.sum(score * score)
    return 1 - (2 * intersect + smooth) / (z + y + smooth)


def torch_multiclass_dice(inputs_cf, labels, n_classes, softmax=False):
    if softmax:
        inputs_cf = torch.softmax(inputs_cf, dim=1)
    one_hot = torch.stack(
        [(labels == i).float() for i in range(n_classes)], dim=1
    )
    loss = 0.0
    for i in range(n_classes):
        loss = loss + torch_dice_loss_squared(inputs_cf[:, i], one_hot[:, i])
    return loss / n_classes


def torch_softmax_dice_loss(input_cf, target_cf):
    smooth = 1e-5
    inp = torch.softmax(input_cf, dim=1)
    tgt = torch.softmax(target_cf, dim=1)
    n = input_cf.shape[1]
    total = 0.0
    for i in range(n):
        intersect = torch.sum(inp[:, i] * tgt[:, i])
        z, y = torch.sum(inp[:, i]), torch.sum(tgt[:, i])
        total = total + 1 - (2 * intersect + smooth) / (z + y + smooth)
    return total / n


def test_cross_entropy(rng):
    logits = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=(2, 8, 8))
    got = float(losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(F.cross_entropy(to_torch_cf(logits), torch.from_numpy(labels)))
    assert abs(got - want) < 1e-5


def test_multiclass_dice(rng):
    logits = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=(2, 8, 8))
    got = float(
        losses.multiclass_dice_loss(jnp.asarray(logits), jnp.asarray(labels), 4, softmax=True)
    )
    want = float(
        torch_multiclass_dice(to_torch_cf(logits), torch.from_numpy(labels), 4, softmax=True)
    )
    assert abs(got - want) < 1e-5


def test_softmax_dice_loss(rng):
    a = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    b = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    got = float(losses.softmax_dice_loss(jnp.asarray(a), jnp.asarray(b)))
    want = float(torch_softmax_dice_loss(to_torch_cf(a), to_torch_cf(b)))
    assert abs(got - want) < 1e-5


def test_softmax_mse_list(rng):
    ins = [rng.normal(size=(2, s, s, 4)).astype(np.float32) for s in (4, 8, 16)]
    tgs = [rng.normal(size=(2, s, s, 4)).astype(np.float32) for s in (4, 8, 16)]
    got = float(losses.softmax_mse_loss([jnp.asarray(x) for x in ins],
                                        [jnp.asarray(x) for x in tgs]))
    want = 0.0
    for i, t in zip(ins, tgs):
        want += float(torch.mean(
            (torch.softmax(to_torch_cf(i), 1) - torch.softmax(to_torch_cf(t), 1)) ** 2
        ))
    want /= 3
    assert abs(got - want) < 1e-6


def test_aux_loss_matches_torch(rng):
    """AuxLoss (losses.py:233-251): upsample + CE + Dice per scale."""
    n_classes = 4
    labels = rng.integers(0, n_classes, size=(2, 16, 16))
    fms = [rng.normal(size=(2, s, s, n_classes)).astype(np.float32) for s in (4, 8)]
    got = float(losses.aux_loss([jnp.asarray(f) for f in fms], jnp.asarray(labels),
                                n_classes, (16, 16)))

    lab_t = torch.from_numpy(labels)
    loss_ce, loss_dice = 0.0, 0.0
    for f in fms:
        f_cf = to_torch_cf(f)
        f_up = F.interpolate(f_cf, size=(16, 16), mode="bilinear")
        loss_ce = loss_ce + F.cross_entropy(f_up, lab_t)
        loss_dice = loss_dice + torch_multiclass_dice(f_up, lab_t, n_classes, softmax=True)
    want = float(loss_ce / 2 + loss_dice / 2)
    assert abs(got - want) < 2e-4, (got, want)


def test_pseudo_soft_loss_matches_torch(rng):
    n_classes = 4
    predicts = rng.normal(size=(2, 16, 16, n_classes)).astype(np.float32)
    fms = [rng.normal(size=(2, s, s, n_classes)).astype(np.float32) for s in (4, 8)]
    got = float(losses.pseudo_soft_loss([jnp.asarray(f) for f in fms],
                                        jnp.asarray(predicts), (16, 16)))
    want = 0.0
    for f in fms:
        f_up = F.interpolate(to_torch_cf(f), size=(16, 16), mode="bilinear")
        want += float(torch_softmax_dice_loss(f_up, to_torch_cf(predicts)))
    want /= 2
    assert abs(got - want) < 2e-4


def test_kl_loss(rng):
    a = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    b = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    got = float(losses.softmax_kl_loss(jnp.asarray(a), jnp.asarray(b)))
    want = float(F.kl_div(F.log_softmax(to_torch_cf(a), 1),
                          torch.softmax(to_torch_cf(b), 1), reduction="mean"))
    assert abs(got - want) < 1e-6
