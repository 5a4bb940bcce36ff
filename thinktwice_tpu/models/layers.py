"""Shared building blocks (flax.linen, NHWC).

Norm policy: the reference uses BatchNorm everywhere with SyncBN in DDP
(configs/thinktwice.py:39, mmdet_train.py:86-87). Mutable cross-device batch
stats are the one part of that design that maps poorly onto pjit-style
functional training, so this rebuild uses GroupNorm throughout — the standard
TPU substitution (documented deviation; widths here are >=32 channels where GN
tracks BN closely).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvGN(nn.Module):
    """Conv -> GroupNorm -> optional ReLU.

    dtype: compute dtype (flax semantics — params stay f32, inputs/compute
    cast to dtype). The heavy trunks pass bfloat16: halves activation HBM
    and runs the MXU in its native dtype. The default None promotes with
    the f32 params, i.e. f32 compute."""

    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    groups: int = 16
    padding: str | int = "SAME"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        pad = self.padding if isinstance(self.padding, str) else [(self.padding, self.padding)] * 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=pad, use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.GroupNorm(num_groups=min(self.groups, self.features),
                         dtype=self.dtype)(x)
        if self.act:
            x = nn.relu(x)
        return x


class SEModule(nn.Module):
    """Squeeze-excitation (code/utils.py:84-121 SEModule)."""

    reduction: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = nn.relu(nn.Conv(max(c // self.reduction, 4), (1, 1),
                            dtype=self.dtype)(s))
        s = nn.sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype)(s))
        return x * s


class SEBasicBlock(nn.Module):
    """Residual block with SE (code/utils.py SEBasicBlock) used by the shared
    BEV pyramid (encoder_decoder_framework.py MLP21/MLP10/MLP4/MLP2)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = ConvGN(self.features, dtype=self.dtype)(x)
        h = ConvGN(self.features, act=False, dtype=self.dtype)(h)
        h = SEModule(dtype=self.dtype)(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), use_bias=False,
                        dtype=self.dtype)(x)
        return nn.relu(x + h)


class MLP(nn.Module):
    """Dense stack with ReLU between layers (optionally after the last)."""

    features: Sequence[int]
    final_act: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype)(x)
            if i < len(self.features) - 1 or self.final_act:
                x = nn.relu(x)
        return x
