"""Fused Pallas window attention vs the XLA einsum reference (interpret
mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from icl_tpu.ops.pallas.window_attention import (
    window_attention_fused,
    window_attention_reference,
)


@pytest.mark.parametrize("N,D,H,B,nW", [(16, 8, 2, 4, 2), (49, 16, 3, 8, 4)])
def test_fused_matches_reference(N, D, H, B, nW):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, N, N)), jnp.float32)
    scale = D**-0.5

    want = window_attention_reference(q, k, v, bias, scale=scale)
    got = window_attention_fused(q, k, v, bias, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    mask = jnp.asarray(
        np.where(rng.random(size=(nW, N, N)) > 0.8, -100.0, 0.0), jnp.float32
    )
    want_m = window_attention_reference(q, k, v, bias, mask, scale=scale)
    got_m = window_attention_fused(q, k, v, bias, mask, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m), atol=2e-5)


def test_fused_gradients_match_reference():
    import jax

    rng = np.random.default_rng(1)
    B, H, N, D, nW = 4, 2, 16, 8, 2
    q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, N, N)), jnp.float32)
    mask = jnp.asarray(
        np.where(rng.random(size=(nW, N, N)) > 0.8, -100.0, 0.0), jnp.float32
    )
    scale = D**-0.5

    def loss_ref(q, k, v, bias):
        return jnp.sum(window_attention_reference(q, k, v, bias, mask, scale=scale) ** 2)

    def loss_fused(q, k, v, bias):
        return jnp.sum(
            window_attention_fused(q, k, v, bias, mask, scale=scale, interpret=True) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
