"""Windowed PID controller as a pure function with explicit carry.

Mirrors code/utils.py:7-29 PIDController: the integral term is the mean of a
length-n error window, the derivative is the difference of the last two
errors. The mutable deque becomes a fixed ring buffer in the carry so the
controller lives inside `lax.scan` rollouts.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PIDState:
    window: jax.Array   # (n,) error history ring
    ptr: jax.Array      # () i32 next write slot
    count: jax.Array    # () i32 saturating fill counter


def pid_init(n: int) -> PIDState:
    return PIDState(
        window=jnp.zeros((n,)),
        ptr=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


def pid_step(state: PIDState, error, kp: float, ki: float, kd: float):
    """-> (control, new_state)."""
    n = state.window.shape[0]
    window = state.window.at[state.ptr].set(error)
    count = jnp.minimum(state.count + 1, n)

    filled = count >= 2
    integral = jnp.where(filled, jnp.sum(window) / count, 0.0)
    prev_idx = jnp.mod(state.ptr - 1, n)
    derivative = jnp.where(filled, error - window[prev_idx], 0.0)

    out = kp * error + ki * integral + kd * derivative
    return out, PIDState(
        window=window, ptr=jnp.mod(state.ptr + 1, n), count=count
    )
