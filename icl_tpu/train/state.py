"""Train state pytree: params + BN batch stats + optimizer state + step."""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
        )
