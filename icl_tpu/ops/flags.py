"""Runtime feature flags for the compute path."""
from __future__ import annotations

import os


def use_pallas_attention() -> bool:
    """Fused Pallas window attention instead of the XLA einsum path.

    Default ON for TPU backends (measured 1.3× faster than the XLA
    einsum path on SwinUNETR window shapes at full f32 accumulation,
    v5e), OFF elsewhere (CPU runs the einsum path; the kernel itself is
    validated in interpret mode in tests). Override with
    ICL_TPU_PALLAS=0/1.
    """
    env = os.environ.get("ICL_TPU_PALLAS")
    if env is not None:
        return env == "1"
    import jax

    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
