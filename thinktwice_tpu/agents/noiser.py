"""Expert control noiser: DAgger-style perturbation episodes.

≡ roach/utils/expert_noiser.py:5-167 (ExpertNoiser): time-based noise
episodes that ramp a steer (or throttle) perturbation up and back down over a
short window, so the expert demonstrates recovery behavior. The reference
keeps wall-clock state; here the schedule is a pure function of the sim tick
and a fold-in of the world rng, so it rides inside `lax.scan`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPISODE_EVERY_S = 25.0     # mean seconds between noise episodes
EPISODE_LEN_S = 1.5        # ramp up + down window
MAX_STEER_NOISE = 0.25
MAX_THROTTLE_NOISE = 0.2


def noise_for_tick(rng, tick, dt: float, kind: str = "steer"):
    """-> additive control perturbation for this tick (scalar).

    Episodes start at pseudo-random times derived from the episode index, so
    the schedule is deterministic given the rng key."""
    t = tick.astype(jnp.float32) * dt
    ep_idx = jnp.floor(t / EPISODE_EVERY_S).astype(jnp.int32)
    ep_key = jax.random.fold_in(rng, ep_idx)
    # each episode: random start offset within its window, random sign/mag
    start = jax.random.uniform(ep_key, (), minval=0.0,
                               maxval=EPISODE_EVERY_S - EPISODE_LEN_S)
    sign = jnp.where(jax.random.bernoulli(jax.random.fold_in(ep_key, 1)), 1.0, -1.0)
    mag = jax.random.uniform(
        jax.random.fold_in(ep_key, 2), (),
        minval=0.3, maxval=1.0,
    ) * (MAX_STEER_NOISE if kind == "steer" else MAX_THROTTLE_NOISE)

    phase = (t - ep_idx.astype(jnp.float32) * EPISODE_EVERY_S - start) / EPISODE_LEN_S
    # triangular ramp 0 -> 1 -> 0 across the episode, zero outside
    envelope = jnp.clip(1.0 - jnp.abs(phase * 2.0 - 1.0), 0.0, 1.0)
    envelope = jnp.where((phase >= 0.0) & (phase <= 1.0), envelope, 0.0)
    return sign * mag * envelope


def apply_noise(rng, tick, control, dt: float = 0.05,
                steer: bool = True, throttle: bool = False):
    """control (3,) (steer, throttle, brake) -> perturbed control."""
    s = control[0]
    th = control[1]
    if steer:
        s = jnp.clip(s + noise_for_tick(rng, tick, dt, "steer"), -1.0, 1.0)
    if throttle:
        th = jnp.clip(
            th + noise_for_tick(jax.random.fold_in(rng, 7), tick, dt, "throttle"),
            0.0, 1.0,
        )
    return jnp.stack([s, th, control[2]])
