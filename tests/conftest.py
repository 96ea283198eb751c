"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware
(SURVEY.md §4 item 4).

Note: this container's sitecustomize force-registers the axon TPU
backend and overrides JAX_PLATFORMS from the environment, so the switch
to CPU must happen through jax.config after import.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# jax defaults matmuls to low precision (bf16 passes); parity tests
# against torch-f32 oracles need exact f32 matmuls.
jax.config.update("jax_default_matmul_precision", "highest")

# Single-core CPU compiles dominate test time — persist them across runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
