"""Torch-checkpoint -> flax converter for the Roach expert policy.

The reference loads its PPO expert from `roach/log/ckpt_11833344.pth`
(roach/models/ppo_policy.py:221-240), applying a key remap for the legacy
`cnn.{2,4,6,8,10}` numbering. That checkpoint file is NOT committed to the
reference repo (no *.pth anywhere in it), so an actual converted artifact
cannot be produced here — this module provides the conversion machinery so
a user holding the published checkpoint gets a drop-in flax pytree for
`agents.roach.RoachPolicy`:

    import torch
    sd = torch.load("ckpt_11833344.pth", map_location="cpu")
    params = convert_roach_state_dict(sd["policy_state_dict"])
    # -> policy.apply(params, birdview, state)

Checkpoint layout handled (ppo_policy.py:_build + torch_layers.XtMaCNN +
distributions.BetaDistribution.proba_distribution_net):

    features_extractor.cnn.{0..5}.{weight,bias}        six VALID convs
    features_extractor.state_linear.{0,2,..}.*         state MLP
    features_extractor.linear.{0,2}.*                  1024+S -> 512 -> 256
    policy_head.{0,2}.*                                two ReLU Linears
    dist_mu.0.* / dist_sigma.0.*                       alpha / beta Linears
                                                       (Sequential w/ Softplus)
    value_head.{0,2,4}.*                               two ReLU Linears + out

plus the legacy `cnn.{0,2,4,6,8,10}` numbering (remapped exactly like
`PpoPolicy.load`). Torch Conv2d weights are OIHW -> flax HWIO; Linear
weights are (out, in) -> flax (in, out).

Why there is deliberately NO converter for the flagship ~100M ThinkTwice
model checkpoint (load site:
`leaderboard/team_code/thinktwice_agent.py:168-172`, mmcv `load_checkpoint`
naming): that model was re-designed TPU-first with GroupNorm throughout
(`models/layers.py:ConvGN`) where the reference uses BatchNorm2d
(`encoder_decoder_framework.py:83`). BatchNorm running statistics have no
GroupNorm counterpart, and folding them into the preceding conv (the
standard inference-time trick) would still be re-normalized by GN, so no
weight mapping can reproduce the reference forward pass — exact conversion
is impossible by construction, and an approximate one would produce a
silently-degraded model while claiming parity. The reference also ships no
.pth for it anywhere in-repo, so there is no artifact to validate against.
A user holding the published checkpoint should distill instead:
`scripts/train_student_town05.py` reproduces the training pipeline
end-to-end. (The Roach policy above has no BN — its conversion IS exact,
see tests/test_convert_torch.py.)
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(t):
    """torch tensor or array-like -> np.float32 array without importing
    torch (works on plain dicts in tests)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _conv(sd, key):
    """torch Conv2d (O, I, kh, kw) -> flax {'kernel': (kh, kw, I, O), 'bias'}."""
    w = _np(sd[f"{key}.weight"])
    return {
        "kernel": np.transpose(w, (2, 3, 1, 0)),
        "bias": _np(sd[f"{key}.bias"]),
    }


def _dense(sd, key):
    """torch Linear (out, in) -> flax {'kernel': (in, out), 'bias'}."""
    return {
        "kernel": _np(sd[f"{key}.weight"]).T,
        "bias": _np(sd[f"{key}.bias"]),
    }


def _seq_indices(sd, prefix):
    """Sorted Sequential child indices that carry weights under prefix."""
    idx = set()
    plen = len(prefix) + 1
    for k in sd:
        if k.startswith(prefix + "."):
            head = k[plen:].split(".", 1)[0]
            if head.isdigit():
                idx.add(int(head))
    return sorted(idx)


def remap_legacy_cnn_keys(sd: Mapping) -> dict:
    """The shipped checkpoint numbers convs 0,2,4,6,8,10 (ReLUs used to be
    Sequential members); PpoPolicy.load renames {2k} -> {k}. Same here."""
    sd = dict(sd)
    cnn_idx = _seq_indices(sd, "features_extractor.cnn")
    if cnn_idx and cnn_idx[-1] == 10:
        for i in (2, 4, 6, 8, 10):
            for p in ("weight", "bias"):
                sd[f"features_extractor.cnn.{i // 2}.{p}"] = sd.pop(
                    f"features_extractor.cnn.{i}.{p}"
                )
    return sd


def _head_linear(sd, name):
    """dist_mu / dist_sigma may be bare Linears or Sequential(linear,
    Softplus) depending on checkpoint vintage."""
    if f"{name}.weight" in sd:
        return _dense(sd, name)
    return _dense(sd, f"{name}.0")


def convert_roach_state_dict(state_dict: Mapping) -> dict:
    """policy_state_dict -> {'params': ...} pytree for RoachPolicy.apply.

    Works for any states_neurons / head depth (inferred from the keys);
    raises KeyError on anything missing so a truncated checkpoint fails
    loudly rather than driving with random weights.
    """
    sd = remap_legacy_cnn_keys(state_dict)

    fx = {}
    n_convs = len(_seq_indices(sd, "features_extractor.cnn"))
    for i in range(n_convs):
        fx[f"Conv_{i}"] = _conv(sd, f"features_extractor.cnn.{i}")

    # flax XtMaCNN Dense counter: state MLP first, then the two fusion
    # Linears (1024+S -> 512 -> features_dim)
    d = 0
    state_idx = _seq_indices(sd, "features_extractor.state_linear")
    for i in state_idx:
        fx[f"Dense_{d}"] = _dense(sd, f"features_extractor.state_linear.{i}")
        d += 1
    lin_idx = _seq_indices(sd, "features_extractor.linear")
    for j, i in enumerate(lin_idx):
        w = _dense(sd, f"features_extractor.linear.{i}")
        if j == 0:
            # torch flattens the conv output NCHW (c-major: c*H*W + h*W + w);
            # the flax module flattens NHWC ((h*W + w)*C + c). Permute the
            # flattened-input rows of the first fusion Linear to compensate.
            s_out = fx[f"Dense_{len(state_idx) - 1}"]["kernel"].shape[1]
            f_flat = w["kernel"].shape[0] - s_out
            c_last = fx[f"Conv_{n_convs - 1}"]["kernel"].shape[-1]
            hw = f_flat // c_last
            h = int(round(hw ** 0.5))
            assert h * h * c_last == f_flat, (f_flat, c_last)
            torch_rows = np.arange(f_flat).reshape(c_last, h, h)  # (c, h, w)
            flax_rows = np.transpose(torch_rows, (1, 2, 0)).reshape(-1)
            kernel = w["kernel"].copy()
            kernel[:f_flat] = w["kernel"][flax_rows]
            w = {"kernel": kernel, "bias": w["bias"]}
        fx[f"Dense_{d}"] = w
        d += 1

    params = {"features_extractor": fx}

    # RoachPolicy Dense counter: policy head first, then value head
    d = 0
    for i in _seq_indices(sd, "policy_head"):
        params[f"Dense_{d}"] = _dense(sd, f"policy_head.{i}")
        d += 1
    params["dist_alpha"] = _head_linear(sd, "dist_mu")
    params["dist_beta"] = _head_linear(sd, "dist_sigma")

    v_idx = _seq_indices(sd, "value_head")
    for i in v_idx[:-1]:
        params[f"Dense_{d}"] = _dense(sd, f"value_head.{i}")
        d += 1
    params["value_out"] = _dense(sd, f"value_head.{v_idx[-1]}")

    return {"params": params}


def convert_roach_checkpoint(path: str) -> tuple[dict, dict]:
    """Load ckpt_11833344.pth-style file -> (flax params, policy_init_kwargs).
    Requires torch (CPU build is fine)."""
    import torch

    saved = torch.load(path, map_location="cpu", weights_only=False)
    params = convert_roach_state_dict(saved["policy_state_dict"])
    return params, saved.get("policy_init_kwargs", {})
