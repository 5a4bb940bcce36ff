"""Torch->flax Roach checkpoint conversion (train/convert_torch.py).

The reference's checkpoint file is not committed upstream, so these tests
build a synthetic `policy_state_dict` with the exact key layout of
ppo_policy.py:_build (including the legacy cnn.{0,2,..,10} numbering that
PpoPolicy.load remaps) from real torch modules, convert it, and assert the
flax RoachPolicy reproduces the torch forward numerically.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from thinktwice_tpu.agents.roach import RoachPolicy  # noqa: E402
from thinktwice_tpu.train.convert_torch import (  # noqa: E402
    convert_roach_state_dict,
    remap_legacy_cnn_keys,
)

STATE_DIM = 6
STATES_NEURONS = (256, 256)   # the shipped checkpoint's config_agent.yaml


def build_torch_policy(seed=0):
    """The reference PpoPolicy's parameter-carrying modules with its
    state_dict key names (ppo_policy.py:66-83, torch_layers.py:10-64)."""
    g = torch.Generator().manual_seed(seed)

    def init(m):
        for p in m.parameters():
            with torch.no_grad():
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        return m

    mods = {}
    chans = [(15, 8, 5, 2), (8, 16, 5, 2), (16, 32, 5, 2), (32, 64, 3, 2),
             (64, 128, 3, 2), (128, 256, 3, 1)]
    mods["features_extractor.cnn"] = torch.nn.ModuleList(
        [init(torch.nn.Conv2d(i, o, k, s)) for i, o, k, s in chans]
    )
    sn = (STATE_DIM,) + STATES_NEURONS
    state_lin = []
    for a, b in zip(sn[:-1], sn[1:]):
        state_lin += [init(torch.nn.Linear(a, b)), torch.nn.ReLU()]
    mods["features_extractor.state_linear"] = torch.nn.Sequential(*state_lin)
    mods["features_extractor.linear"] = torch.nn.Sequential(
        init(torch.nn.Linear(1024 + STATES_NEURONS[-1], 512)), torch.nn.ReLU(),
        init(torch.nn.Linear(512, 256)), torch.nn.ReLU(),
    )
    mods["policy_head"] = torch.nn.Sequential(
        init(torch.nn.Linear(256, 256)), torch.nn.ReLU(),
        init(torch.nn.Linear(256, 256)), torch.nn.ReLU(),
    )
    mods["dist_mu"] = torch.nn.Sequential(
        init(torch.nn.Linear(256, 2)), torch.nn.Softplus())
    mods["dist_sigma"] = torch.nn.Sequential(
        init(torch.nn.Linear(256, 2)), torch.nn.Softplus())
    mods["value_head"] = torch.nn.Sequential(
        init(torch.nn.Linear(256, 256)), torch.nn.ReLU(),
        init(torch.nn.Linear(256, 256)), torch.nn.ReLU(),
        init(torch.nn.Linear(256, 1)),
    )
    return mods


def torch_forward(mods, birdview, state):
    """PpoPolicy.forward on the synthetic modules (birdview already [0,1])."""
    with torch.no_grad():
        x = torch.as_tensor(birdview)
        for conv in mods["features_extractor.cnn"]:
            x = torch.relu(conv(x))
        x = x.flatten(start_dim=1)
        s = mods["features_extractor.state_linear"](torch.as_tensor(state))
        feat = mods["features_extractor.linear"](torch.cat([x, s], dim=1))
        pi = mods["policy_head"](feat)
        alpha = mods["dist_mu"](pi)
        beta = mods["dist_sigma"](pi)
        value = mods["value_head"](feat)
    return (alpha.numpy(), beta.numpy(), value.numpy(), feat.numpy())


def state_dict_of(mods, legacy_cnn=False):
    sd = {}
    for prefix, m in mods.items():
        for k, v in m.state_dict().items():
            if legacy_cnn and prefix == "features_extractor.cnn":
                i, p = k.split(".")
                k = f"{int(i) * 2}.{p}"
            sd[f"{prefix}.{k}"] = v
    return sd


def test_convert_matches_torch_forward():
    mods = build_torch_policy()
    params = convert_roach_state_dict(state_dict_of(mods))

    policy = RoachPolicy(states_neurons=STATES_NEURONS)
    rng = np.random.default_rng(1)
    bv = rng.uniform(0, 1, (2, 15, 192, 192)).astype(np.float32)
    sv = rng.uniform(-1, 1, (2, STATE_DIM)).astype(np.float32)

    # converted tree must match the module's own init structure exactly
    ref = jax.eval_shape(
        lambda: policy.init(jax.random.key(0), jnp.asarray(bv),
                            jnp.asarray(sv))
    )
    assert jax.tree.structure(ref) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(params)):
        assert a.shape == b.shape

    out = policy.apply(params, jnp.asarray(bv), jnp.asarray(sv))
    t_alpha, t_beta, t_value, t_feat = torch_forward(mods, bv, sv)
    np.testing.assert_allclose(out["features"], t_feat, atol=2e-4)
    np.testing.assert_allclose(out["alpha"], t_alpha, atol=2e-4)
    np.testing.assert_allclose(out["beta"], t_beta, atol=2e-4)
    np.testing.assert_allclose(out["value"], t_value, atol=2e-4)


def test_legacy_cnn_numbering_remap():
    mods = build_torch_policy(seed=3)
    legacy = state_dict_of(mods, legacy_cnn=True)
    assert "features_extractor.cnn.10.weight" in legacy
    sd = remap_legacy_cnn_keys(legacy)
    assert "features_extractor.cnn.5.weight" in sd
    assert "features_extractor.cnn.10.weight" not in sd
    # and conversion of legacy == conversion of modern
    a = convert_roach_state_dict(legacy)
    b = convert_roach_state_dict(state_dict_of(mods))
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(x, y)


def test_truncated_checkpoint_fails_loudly():
    sd = state_dict_of(build_torch_policy())
    sd.pop("value_head.4.weight")
    with pytest.raises(KeyError):
        convert_roach_state_dict(sd)
