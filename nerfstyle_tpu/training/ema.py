"""Exponential moving average of parameters.

Rebuild of the reference's ``utils.EMA`` wrapper around torch_ema
(``/root/reference/utils/__init__.py:116-142``).  torch_ema's
ExponentialMovingAverage defaults to ``use_num_updates=True``:
effective decay = min(decay, (1 + n) / (10 + n)).  Same law here, as a pure
pytree transform that lives inside the jitted train step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    shadow: object  # pytree matching params
    num_updates: jnp.ndarray  # i32 scalar


def ema_init(params) -> EmaState:
    return EmaState(
        shadow=jax.tree_util.tree_map(jnp.array, params),
        num_updates=jnp.zeros((), jnp.int32),
    )


def ema_update(state: EmaState, params, decay: Optional[float]) -> EmaState:
    """shadow <- d * shadow + (1 - d) * params with the num_updates ramp.

    decay=None disables EMA (state passes through; the reference's EMA wrapper
    has the same enable toggle)."""
    if decay is None:
        return state
    n = state.num_updates + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    shadow = jax.tree_util.tree_map(
        lambda s, p: s * d + p.astype(s.dtype) * (1.0 - d), state.shadow, params
    )
    return EmaState(shadow=shadow, num_updates=n)


def ema_params(state: EmaState, params, enabled: bool = True):
    """Parameters to evaluate with (shadow if enabled — the reference renders
    eval frames under ema.average_parameters(), trainers/base.py:361)."""
    return state.shadow if enabled else params
