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


def test_region_id_path_matches_dense_mask():
    """region_ids kernel variant (mask synthesized in-kernel) must equal
    the dense-mask reference, including flag-scaled (zeroed) ids."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from icl_tpu.ops.pallas.window_attention import (
        window_attention_fused, window_attention_reference)

    B, H, N, D, nW = 8, 2, 16, 8, 4
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
               for _ in range(3))
    bias = jnp.asarray(rng.normal(size=(H, N, N)), jnp.float32)
    mw = jnp.asarray(rng.integers(0, 3, size=(nW, N)), jnp.float32)
    dense = jnp.where((mw[:, None, :] - mw[:, :, None]) != 0, -100.0, 0.0)
    scale = D ** -0.5

    want = window_attention_reference(q, k, v, bias, dense, scale=scale)
    got = window_attention_fused(q, k, v, bias, None, mw, scale=scale,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)

    # flag=0 (ids zeroed) == unmasked
    want0 = window_attention_reference(q, k, v, bias, None, scale=scale)
    got0 = window_attention_fused(q, k, v, bias, None, jnp.zeros_like(mw),
                                  scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want0),
                               atol=2e-5, rtol=1e-5)

    # gradients flow through the region path (bwd synthesizes per-chunk)
    def loss(q):
        return window_attention_fused(q, k, v, bias, None, mw, scale=scale,
                                      interpret=True).sum()

    g = jax.grad(loss)(q)
    def loss_ref(q):
        return window_attention_reference(q, k, v, bias, dense, scale=scale).sum()
    g_ref = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=2e-4, rtol=1e-4)


def test_pallas_flag_mesh_gating(monkeypatch):
    """The fused kernel stays ON under tp>1 (it is GSPMD-aware via
    custom_partitioning since round 3); shard_state records the mesh
    geometry that routes the dispatch through the Shardy wrapper. Env
    override still wins in both directions."""
    import jax

    from icl_tpu.ops import flags
    from icl_tpu.parallel import mesh as pm

    monkeypatch.delenv("ICL_TPU_PALLAS", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    old_m, old_n = flags.model_axis_size(), flags.mesh_device_count()
    try:
        flags.set_model_axis_size(1)
        assert flags.use_pallas_attention() is True
        flags.set_model_axis_size(2)
        assert flags.use_pallas_attention() is True  # tp>1 keeps the kernel
        monkeypatch.setenv("ICL_TPU_PALLAS", "0")
        assert flags.use_pallas_attention() is False
        monkeypatch.delenv("ICL_TPU_PALLAS")

        # integration: shard_state records model-axis size + device count
        devices = jax.devices("cpu")[:4]
        m = pm.create_mesh(data=2, model=2, devices=devices)
        import jax.numpy as jnp
        import optax

        from icl_tpu.train.state import TrainState
        state = TrainState.create(
            {"dense": {"kernel": jnp.zeros((4, 4))}}, {}, optax.sgd(0.1)
        )
        pm.shard_state(state, m)
        assert flags.model_axis_size() == 2
        assert flags.mesh_device_count() == 4
        m1 = pm.create_mesh(data=4, model=1, devices=devices)
        pm.shard_state(state, m1)
        assert flags.model_axis_size() == 1
        assert flags.mesh_device_count() == 4
    finally:
        flags.set_model_axis_size(old_m)
        flags.set_mesh_device_count(old_n)


def _gspmd_case(mesh_shape, B, H, N, D, nW, mode, monkeypatch):
    """Run window_attention_fused (interpret mode) with q/k/v sharded
    over a dp×tp CPU mesh and compare against the unsharded einsum
    reference — value AND grads through the custom_vjp."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from icl_tpu.ops import flags
    from icl_tpu.parallel import mesh as pm

    dp, tp = mesh_shape
    devices = jax.devices("cpu")[: dp * tp]
    mesh = pm.create_mesh(data=dp, model=tp, devices=devices)
    old_n, old_m = flags.mesh_device_count(), flags.model_axis_size()
    flags.set_mesh_device_count(mesh.devices.size)
    flags.set_model_axis_size(tp)
    try:
        rng = np.random.default_rng(7)
        q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
                   for _ in range(3))
        bias = jnp.asarray(rng.normal(size=(H, N, N)), jnp.float32)
        mw = jnp.asarray(rng.integers(0, 3, size=(nW, N)), jnp.float32)
        dense = jnp.where((mw[:, None, :] - mw[:, :, None]) != 0, -100.0, 0.0)
        scale = D ** -0.5

        qkv_sh = NamedSharding(mesh, P("data", "model"))
        bias_sh = NamedSharding(mesh, P("model"))
        rep = NamedSharding(mesh, P())
        qs, ks, vs = (jax.device_put(x, qkv_sh) for x in (q, k, v))
        biass = jax.device_put(bias, bias_sh)

        if mode == "region":
            extra_args = dict(mask=None, region_ids=jax.device_put(mw, rep))
        elif mode == "dense":
            extra_args = dict(mask=jax.device_put(dense, rep))
        else:
            extra_args = {}

        def f(q, k, v, bias):
            out = window_attention_fused(q, k, v, bias, scale=scale,
                                         interpret=True, **extra_args)
            return jnp.sum(out ** 2), out

        (loss, out), grads = jax.jit(
            lambda *a: jax.value_and_grad(f, argnums=(0, 1, 2, 3),
                                          has_aux=True)(*a)
        )(qs, ks, vs, biass)

        ref_mask = dense if mode in ("region", "dense") else None

        def f_ref(q, k, v, bias):
            out = window_attention_reference(q, k, v, bias, ref_mask,
                                             scale=scale)
            return jnp.sum(out ** 2), out

        (loss_r, out_r), grads_r = jax.value_and_grad(
            f_ref, argnums=(0, 1, 2, 3), has_aux=True)(q, k, v, bias)

        np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                                   atol=3e-5, rtol=1e-5)
        np.testing.assert_allclose(float(loss), float(loss_r), rtol=1e-5)
        for a, b in zip(grads, grads_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=1e-4)
    finally:
        flags.set_mesh_device_count(old_n)
        flags.set_model_axis_size(old_m)


@pytest.mark.parametrize("mode", ["none", "dense", "region"])
def test_gspmd_partitioned_kernel_dp_tp(mode, monkeypatch):
    """dp2×tp2: batch shards stay window-aligned (local B = 4 = nW) and
    heads split over the model axis — the per-shard pallas kernel runs
    and matches the unsharded reference."""
    _gspmd_case((2, 2), B=8, H=2, N=16, D=8, nW=4, mode=mode,
                monkeypatch=monkeypatch)


def test_gspmd_misaligned_batch_shard_falls_back(monkeypatch):
    """dp8 over B=8 with nW=4: each shard holds ONE window row (local
    B=1, not a multiple of nW) — the wrapper's shard-local einsum
    fallback with global-offset window indexing must keep exact
    semantics."""
    _gspmd_case((8, 1), B=8, H=2, N=16, D=8, nW=4, mode="region",
                monkeypatch=monkeypatch)
