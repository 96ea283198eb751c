"""Fused sspa pair call (models/icl.py sspa_paired) ≡ the reference's
two sequential shared-weight calls (unet_icl.py:230-231).

The fusion exists for bandwidth (class-decoder weights read once per
step — docs/ROOFLINE.md §4.2) and must be a pure re-association:
per-sample ops batched, the BatchNorm-bearing SeparableConv split per
branch, Q-means over the labeled half only. With drop-path off the two
forms must agree to float tolerance in outputs, gradients AND the
mutated BN running stats.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icl_tpu.models.unet2d_icl import UNetICL


def _models_and_inputs():
    kw = dict(in_chns=1, class_num=4, patch_size=32, zero_stochastic=True)
    ref = UNetICL(**kw)
    fused = UNetICL(**kw, fuse_sspa_pair=True)
    rng = np.random.default_rng(0)
    # Unequal branch batches to catch any split/concat indexing bug.
    x_lab = jnp.asarray(rng.normal(size=(2, 32, 32, 1)), jnp.float32)
    x_unlab = jnp.asarray(rng.normal(size=(3, 32, 32, 1)), jnp.float32)
    variables = ref.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x_lab, x_unlab, train=True,
    )
    return ref, fused, variables, x_lab, x_unlab


def _apply(model, variables, x_lab, x_unlab):
    return model.apply(
        variables, x_lab, x_unlab, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.key(2)},
    )


def test_fused_forward_and_batch_stats_match_two_call_form():
    ref, fused, variables, x_lab, x_unlab = _models_and_inputs()
    out_ref, mut_ref = _apply(ref, variables, x_lab, x_unlab)
    out_fused, mut_fused = _apply(fused, variables, x_lab, x_unlab)

    flat_ref = jax.tree.leaves(out_ref)
    flat_fused = jax.tree.leaves(out_fused)
    assert len(flat_ref) == len(flat_fused)
    for a, b in zip(flat_ref, flat_fused):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)

    # BN running stats: per-branch normalization + the labeled-then-other
    # sequential update order must be preserved exactly.
    ref_stats = jax.tree.leaves(mut_ref["batch_stats"])
    fused_stats = jax.tree.leaves(mut_fused["batch_stats"])
    assert len(ref_stats) == len(fused_stats) > 0
    for a, b in zip(ref_stats, fused_stats):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_fused_gradients_match_two_call_form():
    ref, fused, variables, x_lab, x_unlab = _models_and_inputs()

    def loss_fn(model, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x_lab, x_unlab, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.key(2)},
        )
        return sum(jnp.sum(x**2) for x in jax.tree.leaves(out))

    g_ref = jax.grad(lambda p: loss_fn(ref, p))(variables["params"])
    g_fused = jax.grad(lambda p: loss_fn(fused, p))(variables["params"])
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("key", ["unet_3D_icl", "icl_swinunet", "swinunetr_icl"])
def test_fuse_flag_reaches_other_icl_families(key):
    """Factory plumbing: every ICL family accepts fuse_sspa_pair."""
    from icl_tpu.models.registry import net_factory

    m = net_factory(key, in_chns=1, class_num=2, fuse_sspa_pair=True)
    assert m.fuse_sspa_pair is True
