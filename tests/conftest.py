"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware
(SURVEY.md §4 item 4). Must run before jax is imported."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax defaults matmuls to low precision (bf16 passes) even on CPU; parity
# tests against torch-f32 oracles need exact f32 matmuls.
jax.config.update("jax_default_matmul_precision", "highest")
