"""Experiment configuration.

One typed config replaces the reference's 10 copy-pasted argparse blocks
(SURVEY.md §7 design translation). Field names/defaults mirror the
reference flags (train_inherent_consistent_unet_2D.py:22-49) so the CLI
shims map 1:1, plus TPU-native knobs (precision, mesh shape).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass
class ExperimentConfig:
    # Reference flags
    root_path: str = "../ACDC"
    exp: str = "ACDC/Inherent_Consistent_Learning"
    model: str = "icl_unet"
    num_classes: int = 4
    in_chns: int = 1
    max_iterations: int = 30000
    batch_size: int = 16
    # -1 = unset: resolved to min(8, batch_size) in __post_init__ (the
    # reference default is 8, but the fully-supervised 3D scripts run
    # --batch_size 4 without ever passing labeled_bs — their default
    # invocation must not trip the labeled_bs<=batch_size validation,
    # which labeled_bs is unused on that path anyway; ADVICE r4)
    labeled_bs: int = -1
    base_lr: float = 0.01
    patch_size: Sequence[int] = (256, 256)
    seed: int = 1337
    labeled_num: int = 7
    num_tries: str = "1"
    deterministic: int = 1

    # Loss weights (per-dataset table, SURVEY.md §2.4)
    consis_weight: float = 50.0
    pse_weight: float = 1.0
    seg_weight: float = 1.0  # AMOS supervised uses 0.5 (…AMOS22.py:198)

    # Optimizer (constant across the reference)
    momentum: float = 0.9
    weight_decay: float = 1e-4
    poly_power: float = 0.9

    # Eval cadence
    val_interval: int = 200
    # Scalar-logging cadence. 1 = every iteration (reference behavior,
    # train_…unet_2D.py:137-146) but forces a device sync per step; the
    # TPU step runs ~240/s, so raising this lets the device run ahead.
    log_interval: int = 1
    # Periodic resumable checkpointing (capability addition — the
    # reference's --resume flag is parsed but dead, net_factory.py:48).
    # 0 disables; N saves the full TrainState every N iterations.
    checkpoint_interval: int = 0
    # Rolling retention for periodic checkpoints (keep-last-N step files;
    # `state_last.msgpack` always tracks the newest).
    keep_checkpoints: int = 3

    # TPU-native knobs
    precision: str = "float32"  # 'float32' (parity) | 'bfloat16' (perf)
    # Train-STATE storage dtype (round-5 bandwidth optimization,
    # docs/ROOFLINE.md §4): 'bfloat16' stores params + momentum in bf16
    # with f32 update math and stochastically rounded stores — halves
    # the per-step HBM traffic of the optimizer (the flagship's binding
    # bottleneck: 2 × 8.55 GiB state moved per step) and the state/
    # checkpoint size. 'float32' = reference-exact storage (default).
    state_dtype: str = "float32"
    # Multi-step fusion: lax.scan `scan_steps` train steps into ONE XLA
    # program (one host dispatch per group — amortizes dispatch/tunnel
    # latency; numerically identical to per-step dispatch because the
    # per-step RNG is derived from state.step inside the program either
    # way). fit() never scans across a validation/checkpoint boundary,
    # so val/ckpt cadence is exact. 1 = per-step dispatch.
    scan_steps: int = 1
    # Bounded dispatch pipeline: keep up to `dispatch_depth` step/scan
    # groups in flight before fencing the oldest (fit() loop). 1 = the
    # safe default (one dispatch in flight — free-running dispatch with
    # donated multi-GB states can collapse the allocator on some
    # runtimes, see bench.py). >1 amortizes the per-dispatch host→device
    # round trip across in-flight groups — on a tunneled/remote device
    # the RTT can dominate the step itself; numerically identical (the
    # dispatch SEQUENCE is unchanged, only host fencing moves). Scalar
    # logging is already deferred one group; it defers `dispatch_depth`
    # groups instead, with exact drain at val/ckpt boundaries.
    dispatch_depth: int = 1
    # Live FLOPs observability: after the first dispatch, hand-count the
    # step's matmul/conv FLOPs from the traced jaxpr (utils/flops.py —
    # the defensible MFU numerator, not XLA's remat-double-counting cost
    # model) and log GFLOP/step + end-to-end analytic TFLOP/s in the
    # training summary. Pure host-side tracing; overlaps the first
    # step's device compile. False skips the trace.
    log_flops: bool = True
    # Fuse the two labeled-mode sspa passes of the ICL models into one
    # batched call (reference makes two sequential shared-weight calls,
    # unet_icl.py:230-231): the bandwidth-bound class-decoder weights
    # are read once per step instead of twice (docs/ROOFLINE.md §4.2).
    # Per-branch BN batch stats and labeled-only Q-means are preserved
    # (models/icl.py pair_split) — equal to the two-call form up to
    # drop-path RNG draws. Ignored by non-ICL models.
    fuse_icl_pair: bool = False
    remat: bool = False  # rematerialize forward in backprop (memory/flops)
    # Gradient accumulation (the reference parses --accumulation-steps but
    # never uses it, net_factory.py:49-50; here it works via
    # optax.MultiSteps). 1 = off.
    grad_accum: int = 1
    # Fuse the 2D augmentations (rot90/flip/±20° rotate/zoom) INTO the
    # jitted train step (device-side pipeline; feed raw same-size slices
    # via data.pipeline.acdc_raw_batches). Divergence from the host path:
    # augmentation happens after the canonical resize instead of before.
    device_augment: bool = False
    mesh_data: int = -1  # -1 = all devices on the data axis
    mesh_model: int = 1
    experiments_dir: str = "../experiments"
    # Extra kwargs forwarded to net_factory (e.g. feature_size /
    # window_size for the SwinUNETR family).
    model_kwargs: dict = dataclasses.field(default_factory=dict)
    # Persistent XLA compile cache (big QoL on repeat CLI runs: the 3D
    # Swin step costs ~100s to compile cold, the 1.1B-param 2D ICL init
    # several minutes). "" disables.
    compile_cache_dir: str = "~/.cache/icl_tpu_jax"

    def __post_init__(self):
        # Fail loud at config time: a labeled_bs above batch_size turns
        # the unlabeled sub-batch count negative deep inside the jitted
        # step (surfaces as a cryptic negative broadcast_in_dim shape).
        # The reference has the same latent trap (its [labeled_bs:]
        # slices silently go empty); here it is a config error.
        if self.labeled_bs == -1:
            self.labeled_bs = min(8, self.batch_size)
        if not 0 < self.labeled_bs <= self.batch_size:
            raise ValueError(
                f"labeled_bs={self.labeled_bs} must be in [1, batch_size="
                f"{self.batch_size}] — shrinking --batch_size requires "
                f"shrinking --labeled_bs with it"
            )
        if self.scan_steps < 1 or self.grad_accum < 1 or self.dispatch_depth < 1:
            raise ValueError(
                f"scan_steps ({self.scan_steps}), grad_accum "
                f"({self.grad_accum}) and dispatch_depth "
                f"({self.dispatch_depth}) must be >= 1"
            )
        if self.state_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"state_dtype: {self.state_dtype!r}")
        if self.state_dtype == "bfloat16" and self.grad_accum > 1:
            # optax.MultiSteps would accumulate micro-grads in the bf16
            # param dtype, defeating the mean-gradient contract
            raise ValueError("state_dtype='bfloat16' requires grad_accum=1")

    @property
    def snapshot_path(self) -> str:
        # Reference layout: ../experiments/{exp}_{labeled_num}_labeled/
        # {model}_exp_{num_tries} (train_…unet_2D.py:242-245)
        return (
            f"{self.experiments_dir}/{self.exp}_{self.labeled_num}_labeled/"
            f"{self.model}_exp_{self.num_tries}"
        )

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


def acdc_icl_config(**overrides) -> ExperimentConfig:
    return ExperimentConfig(**overrides)


def acdc_supervised_config(**overrides) -> ExperimentConfig:
    cfg = ExperimentConfig(
        exp="ACDC/Fully_Supervised", model="unet", labeled_num=7,
        consis_weight=0.0, pse_weight=0.0,
    )
    return cfg.replace(**overrides)
