"""Roach privileged expert policy as a flax module.

Architecture parity with the reference PPO expert
(roach/models/ppo_policy.py:11-120 + torch_layers.py XtMaCNN:10-89 +
distributions.py BetaDistribution:170-278):

- XtMaCNN trunk over the 15-channel birdview: 6 VALID convs
  (8,5,s2)->(16,5,s2)->(32,5,s2)->(64,3,s2)->(128,3,s2)->(256,3,s1), ReLU
  after every conv; 192x192 input -> 2x2x256 -> flatten 1024.
- state MLP 6->256, concat -> 512 -> 256 features (two ReLU Linears).
- policy head [256, 256] ReLU -> two Linear(2) + softplus -> (alpha, beta)
  per action dim [acc, steer]; value head [256, 256] -> 1.
- Per-layer CNN activations are returned as distillation targets
  (cnn_feature list in XtMaCNN.forward — the supervision ThinkTwice trains
  against, thinktwice_decoder.py loss).

Inputs follow the wrapper conventions (roach/utils/rl_birdview_wrapper.py):
birdview in [0, 1] (the torch code divides by 255 in _get_features), state =
[throttle, steer, brake, gear, vel_x, vel_y].
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class XtMaCNN(nn.Module):
    features_dim: int = 256
    states_neurons: Sequence[int] = (256,)

    @nn.compact
    def __call__(self, birdview, state):
        """birdview (B, C, H, W) in [0,1]; state (B, state_dim).

        Returns (features (B, 256), cnn_features list of (B, Ci, Hi, Wi))."""
        x = jnp.transpose(birdview, (0, 2, 3, 1))  # NHWC for flax convs
        cnn_feats = []
        specs = [(8, 5, 2), (16, 5, 2), (32, 5, 2), (64, 3, 2), (128, 3, 2), (256, 3, 1)]
        for ch, k, s in specs:
            x = nn.Conv(
                ch, (k, k), strides=(s, s), padding="VALID",
                kernel_init=nn.initializers.xavier_uniform(),
                bias_init=nn.initializers.constant(0.1),
            )(x)
            x = nn.relu(x)
            cnn_feats.append(jnp.transpose(x, (0, 3, 1, 2)))  # NCHW like ref

        x = x.reshape(x.shape[0], -1)  # (B, 1024)

        s = state
        for n in self.states_neurons:
            s = nn.relu(nn.Dense(n)(s))

        x = jnp.concatenate([x, s], axis=-1)
        x = nn.relu(nn.Dense(512)(x))
        x = nn.relu(nn.Dense(self.features_dim)(x))
        return x, cnn_feats


class RoachPolicy(nn.Module):
    features_dim: int = 256
    states_neurons: Sequence[int] = (256,)
    policy_head_arch: Sequence[int] = (256, 256)
    value_head_arch: Sequence[int] = (256, 256)
    action_dim: int = 2

    @nn.compact
    def __call__(self, birdview, state):
        """-> dict with alpha, beta (B, 2), value (B, 1), features (B, 256),
        cnn_features (list). Mirrors PpoPolicy.forward's outputs (actions are
        derived by the caller: beta_mode / beta_sample)."""
        features, cnn_feats = XtMaCNN(
            self.features_dim, self.states_neurons, name="features_extractor"
        )(birdview, state)

        pi = features
        for n in self.policy_head_arch:
            pi = nn.relu(nn.Dense(n)(pi))
        alpha = nn.softplus(nn.Dense(self.action_dim, name="dist_alpha")(pi))
        beta = nn.softplus(nn.Dense(self.action_dim, name="dist_beta")(pi))

        vf = features
        for n in self.value_head_arch:
            vf = nn.relu(nn.Dense(n)(vf))
        value = nn.Dense(1, name="value_out")(vf)

        return {
            "alpha": alpha,
            "beta": beta,
            "value": value,
            "features": features,
            "cnn_features": cnn_feats,
        }


def beta_mode(alpha, beta):
    """Deterministic action from Beta(alpha, beta) on [0, 1], rescaled to
    [-1, 1] — exact mirror of BetaDistribution.mode (distributions.py:255-273)
    + the caller's x*2-1 (encoder_decoder_framework._get_action_beta)."""
    mode = (alpha - 1) / jnp.maximum(alpha + beta - 2, 1e-9)
    mean = alpha / jnp.maximum(alpha + beta, 1e-5)
    x = jnp.where(
        (alpha > 1) & (beta > 1),
        mode,
        jnp.where(
            (alpha <= 1) & (beta > 1),
            0.0,
            jnp.where((alpha > 1) & (beta <= 1), 1.0, mean),
        ),
    )
    # steer dim defaults to 0.5 pre-rescale in the reference (x[:, 1] += 0.5
    # on the zeros init) — covered by the masks above except when alpha=beta=1
    # exactly, where mean = 0.5 anyway.
    return x * 2.0 - 1.0


def beta_sample(rng, alpha, beta):
    """Reparameterized-ish sample via two Gammas, rescaled to [-1, 1]."""
    k1, k2 = jax.random.split(rng)
    g1 = jax.random.gamma(k1, alpha)
    g2 = jax.random.gamma(k2, beta)
    x = g1 / jnp.maximum(g1 + g2, 1e-9)
    return x * 2.0 - 1.0


def beta_log_prob(actions_pm1, alpha, beta):
    """Log-density of actions in [-1, 1] under the [0,1] Beta, summed over
    action dims (sum_independent_dims in distributions.py)."""
    x = jnp.clip((actions_pm1 + 1.0) / 2.0, 1e-6, 1 - 1e-6)
    lp = (
        (alpha - 1) * jnp.log(x)
        + (beta - 1) * jnp.log1p(-x)
        - (
            jax.scipy.special.gammaln(alpha)
            + jax.scipy.special.gammaln(beta)
            - jax.scipy.special.gammaln(alpha + beta)
        )
    )
    return jnp.sum(lp, axis=-1)


def acc_to_control(action_pm1):
    """(acc, steer) in [-1, 1] -> (steer, throttle, brake) control triple
    (acc_as_action mapping, roach/utils/rl_birdview_wrapper.py:process_act)."""
    acc = action_pm1[..., 0]
    steer = jnp.clip(action_pm1[..., 1], -1.0, 1.0)
    throttle = jnp.clip(acc, 0.0, 1.0)
    brake = jnp.clip(-acc, 0.0, 1.0)
    return jnp.stack([steer, throttle, brake], axis=-1)
