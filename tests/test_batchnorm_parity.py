"""BatchNorm semantics vs torch: our flax BatchNorm wrapper must match
torch BN's normalization in train and eval, and its running-mean update
(momentum 0.1). One documented divergence: torch tracks running_var with
the UNBIASED batch variance, flax with the biased one — negligible at
segmentation batch sizes (n = B·H·W) and irrelevant for checkpoint
import (stats are copied verbatim); asserted here so the divergence
stays understood."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from icl_tpu.models.layers import BatchNorm


def _apply(x, train, variables):
    m = BatchNorm()
    if train:
        out, mut = m.apply(variables, jnp.asarray(x), True, mutable=["batch_stats"])
        return np.asarray(out), jax.device_get(mut["batch_stats"])
    return np.asarray(m.apply(variables, jnp.asarray(x), False)), None


def test_train_normalization_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(2.0, 3.0, size=(4, 6, 6, 5)).astype(np.float32)
    m = BatchNorm()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), True)

    bn = torch.nn.BatchNorm2d(5)
    bn.train()
    want = bn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).detach().numpy()

    got, mut = _apply(x, True, v)
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, atol=2e-5)

    # running mean identical; running var differs by the n/(n-1) factor
    # applied to the batch-update term only
    np.testing.assert_allclose(
        mut["BatchNorm_0"]["mean"], bn.running_mean.numpy(), atol=1e-6
    )
    n = x.shape[0] * x.shape[1] * x.shape[2]
    vb = x.reshape(-1, 5).var(axis=0)  # biased batch variance
    np.testing.assert_allclose(
        mut["BatchNorm_0"]["var"], 0.9 * 1.0 + 0.1 * vb, atol=1e-5
    )
    np.testing.assert_allclose(
        bn.running_var.numpy(), 0.9 * 1.0 + 0.1 * vb * n / (n - 1), atol=1e-5
    )


def test_eval_uses_running_stats_like_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    m = BatchNorm()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    # craft running stats + affine
    stats = {"BatchNorm_0": {"mean": jnp.asarray([0.5, -1.0, 2.0]),
                             "var": jnp.asarray([1.5, 0.25, 4.0])}}
    params = {"BatchNorm_0": {"scale": jnp.asarray([1.0, 2.0, 0.5]),
                              "bias": jnp.asarray([0.0, 1.0, -1.0])}}
    got = np.asarray(m.apply({"params": params, "batch_stats": stats},
                             jnp.asarray(x), False))

    bn = torch.nn.BatchNorm2d(3)
    bn.eval()
    with torch.no_grad():
        bn.running_mean.copy_(torch.tensor([0.5, -1.0, 2.0]))
        bn.running_var.copy_(torch.tensor([1.5, 0.25, 4.0]))
        bn.weight.copy_(torch.tensor([1.0, 2.0, 0.5]))
        bn.bias.copy_(torch.tensor([0.0, 1.0, -1.0]))
        want = bn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, atol=2e-5)
