"""ResNet backbone + PAFPN neck (flax, NHWC, GroupNorm).

Capability parity with the reference's mmdet ResNet-50 + PAFPN
(configs/thinktwice.py img_backbone_conf/img_neck_conf: depth 50,
out_indices [0,1,2,3], PAFPN in [256,512,1024,2048] -> 4 x 256). Depth is
configurable; 50 reproduces the reference capacity, smaller depths trade
accuracy for step time. bfloat16-friendly: all convs run in the input dtype,
GroupNorm accumulates in f32.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from thinktwice_tpu.models.layers import ConvGN


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = ConvGN(self.features, stride=self.stride, dtype=self.dtype)(x)
        h = ConvGN(self.features, act=False, dtype=self.dtype)(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = ConvGN(self.features, kernel=1, stride=self.stride, act=False,
                       dtype=self.dtype)(x)
        return nn.relu(x + h)


class Bottleneck(nn.Module):
    features: int  # output (expanded) width = features; inner = features // 4
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        inner = self.features // 4
        h = ConvGN(inner, kernel=1, dtype=self.dtype)(x)
        h = ConvGN(inner, stride=self.stride, dtype=self.dtype)(h)
        h = ConvGN(self.features, kernel=1, act=False, dtype=self.dtype)(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = ConvGN(self.features, kernel=1, stride=self.stride, act=False,
                       dtype=self.dtype)(x)
        return nn.relu(x + h)


RESNET_SPECS = {
    10: (BasicBlock, (1, 1, 1, 1), (32, 64, 128, 256)),   # tiny (dry runs)
    18: (BasicBlock, (2, 2, 2, 2), (64, 128, 256, 512)),
    34: (BasicBlock, (3, 4, 6, 3), (64, 128, 256, 512)),
    50: (Bottleneck, (3, 4, 6, 3), (256, 512, 1024, 2048)),
}


class ResNet(nn.Module):
    """-> list of 4 feature maps at strides 4, 8, 16, 32.

    remat granularity: per residual block. The backward then only ever holds
    one block's internal activations plus the (much smaller) block-boundary
    tensors — bounded peak regardless of depth. A single remat around the
    whole backbone is useless (its backward recompute retains every
    intermediate anyway), and wrapping it again from outside nests remats
    the XLA scheduler handles poorly (measured 57-91 GB HLO temp at the
    flagship training batch on a 15.75 GB chip)."""

    depth: int = 50
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        block, layers, widths = RESNET_SPECS[self.depth]
        block = nn.remat(block)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=16, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        outs = []
        for i, (n, w) in enumerate(zip(layers, widths)):
            for j in range(n):
                x = block(w, stride=2 if (i > 0 and j == 0) else 1,
                          dtype=self.dtype)(x)
            outs.append(x)
        return outs


def _resize_nearest(x, hw):
    b, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, hw[0] // h, axis=1), hw[1] // w, axis=2) \
        if hw[0] % h == 0 and hw[1] % w == 0 else \
        x  # only integer upsampling occurs in the FPN


class PAFPN(nn.Module):
    """Path-aggregation FPN (FPN top-down + extra bottom-up path, matching
    mmdet PAFPN semantics). -> 4 maps, all `out_channels`."""

    out_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, feats):
        conv = lambda *a, **kw: nn.Conv(*a, dtype=self.dtype, **kw)
        # lateral 1x1
        lats = [conv(self.out_channels, (1, 1))(f) for f in feats]
        # top-down
        td = [None] * len(lats)
        td[-1] = lats[-1]
        for i in range(len(lats) - 2, -1, -1):
            up = _resize_nearest(td[i + 1], lats[i].shape[1:3])
            td[i] = lats[i] + up
        # 3x3 smoothing
        td = [conv(self.out_channels, (3, 3), padding="SAME")(f) for f in td]
        # bottom-up augmentation
        out = [None] * len(td)
        out[0] = td[0]
        for i in range(1, len(td)):
            down = conv(
                self.out_channels, (3, 3), strides=(2, 2), padding="SAME"
            )(out[i - 1])
            out[i] = td[i] + down
        out = [conv(self.out_channels, (3, 3), padding="SAME")(f) for f in out]
        return out
