"""Device mesh + sharding utilities.

TPU-native replacement for the reference's (dead) NCCL DDP helpers
(utils/util.py:240-244 — never invoked; SURVEY.md §2.6): a named
`jax.sharding.Mesh` with a `data` axis for batch parallelism over ICI
and a `model` axis for tensor-sharding the large ICL token-MLP weights.
XLA inserts the psum/all-gathers; no explicit collectives needed in the
train step.
"""
from __future__ import annotations

import re
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel rules, Megatron column→row pairs throughout (column
# shards the output dim + bias; the paired row layer shards the input
# dim and keeps bias replicated, XLA inserting the psum).
#
#  * ICL Class_Decoder token-MLP ("mlp2"): N_patch×N_patch kernels (up
#    to 16384² for the 2D UNet at 256² patches, unet_icl.py:354-355) —
#    by far the largest weights in the framework.
#  * Swin window attention qkv→proj and block MLPs, both dialects
#    (2D swin2d.py `mlp/fc1|fc2`, 3D swinunetr.py `mlp_linear1|2`).
#    qkv output is [3·heads·hd]; the model axis divides the head dim
#    whenever heads % tp == 0 (Swin-T heads 3/6/12/24 → tp 2 or 3).
#  * ICL Query_Attention fc_q/fc_kv column + proj row (shared `attn`
#    naming with Swin blocks, icl.py).
#  * Widest UNETR conv pair (16·fs=768 channels, swinunetr.py
#    encoder10/decoder5): conv1 column (output channels — per-channel
#    InstanceNorm and leaky-relu stay shard-local), conv2 row.
#
# The fused Pallas window-attention kernel partitions under GSPMD via a
# Shardy custom_partitioning wrapper (batch/head factors shard; window
# geometry replicates); shard_state records the mesh size so the wrapper
# engages only on multi-device meshes.
DEFAULT_PARAM_RULES: list[tuple[str, P]] = [
    (r".*mlp2/fc1/Dense_0/kernel", P(None, "model")),
    (r".*mlp2/fc1/Dense_0/bias", P("model")),
    (r".*mlp2/fc2/Dense_0/kernel", P("model", None)),
    (r".*attn/qkv/Dense_0/kernel", P(None, "model")),
    (r".*attn/qkv/Dense_0/bias", P("model")),
    (r".*attn/fc_q/Dense_0/kernel", P(None, "model")),
    (r".*attn/fc_q/Dense_0/bias", P("model")),
    (r".*attn/fc_kv/Dense_0/kernel", P(None, "model")),
    (r".*attn/fc_kv/Dense_0/bias", P("model")),
    (r".*attn/proj/Dense_0/kernel", P("model", None)),
    (r".*mlp/fc1/Dense_0/kernel", P(None, "model")),
    (r".*mlp/fc1/Dense_0/bias", P("model")),
    (r".*mlp/fc2/Dense_0/kernel", P("model", None)),
    (r".*mlp_linear1/Dense_0/kernel", P(None, "model")),
    (r".*mlp_linear1/Dense_0/bias", P("model")),
    (r".*mlp_linear2/Dense_0/kernel", P("model", None)),
    (r".*(encoder10|decoder5/conv_block)/conv1/Conv_0/kernel",
     P(None, None, None, None, "model")),
    (r".*(encoder10|decoder5/conv_block)/conv2/Conv_0/kernel",
     P(None, None, None, "model", None)),
]


def param_shardings(params, mesh: Mesh, rules: Sequence[tuple[str, P]] | None = None):
    """Build a NamedSharding pytree for `params` from (regex, spec) rules;
    unmatched leaves are replicated.

    Specs are RIGHT-aligned to the leaf rank: a rule written for an
    unstacked [in, out] kernel also applies to the nn.scan-stacked
    [depth, in, out] layout (SwinStage3D), replicating the extra leading
    block axis."""
    rules = DEFAULT_PARAM_RULES if rules is None else rules
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def spec_for(path, leaf) -> NamedSharding:
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        rank = getattr(leaf, "ndim", 0)
        for pat, spec in compiled:
            if pat.fullmatch(name):
                if len(spec) < rank:
                    spec = P(*((None,) * (rank - len(spec)) + tuple(spec)))
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_state(state, mesh: Mesh, rules=None):
    """device_put a TrainState with param rules applied to params and the
    matching momentum buffers; everything else replicated.

    Also records the mesh geometry so the fused attention routes through
    its GSPMD custom_partitioning wrapper on multi-device meshes —
    shard_state runs before any train-step trace in every integration
    point (Trainer.init_state, dryrun_multichip, tests)."""
    from icl_tpu.ops import flags

    flags.set_model_axis_size(dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1))
    flags.set_mesh_device_count(mesh.devices.size)
    p_sh = param_shardings(state.params, mesh, rules)

    def put(tree, sh):
        return jax.device_put(tree, sh)

    params = put(state.params, p_sh)
    batch_stats = put(state.batch_stats, replicated(mesh))
    # optax.trace keeps momentum with the same tree structure as params —
    # shard it identically; other opt-state leaves are replicated.
    def shard_opt(o):
        import optax

        def match(x):
            if isinstance(x, optax.TraceState):
                return x._replace(trace=put(x.trace, p_sh))
            return x

        return jax.tree_util.tree_map(
            match, o, is_leaf=lambda x: isinstance(x, optax.TraceState)
        )

    opt_state = shard_opt(state.opt_state)
    opt_state = jax.tree_util.tree_map(
        lambda x: x if hasattr(x, "sharding") and isinstance(getattr(x, "sharding", None), NamedSharding)
        else put(x, replicated(mesh)),
        opt_state,
    )
    step = put(state.step, replicated(mesh))
    return state.replace(step=step, params=params, batch_stats=batch_stats,
                         opt_state=opt_state)
