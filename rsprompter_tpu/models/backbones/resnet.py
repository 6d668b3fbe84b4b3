"""ResNet backbone (flax, NHWC) for the SAM-det detector branch.

Behavior parity: the torchvision-style ResNet used by mmdet
(``mmdet/models/backbones/resnet.py``; SAM-det config
``configs/rsprompter/_base_/samdet.py`` uses ResNet-50 + FPN). Module names
mirror torch (``conv1``/``bn1``/``layer1.0.conv1``...) so both torchvision and
mmdet checkpoints convert mechanically. Returns the out_indices stage maps
(C2..C5) as NHWC tensors.

Frozen-BN semantics: mmdet trains ResNet with ``norm_eval=True`` (BN in eval
mode, running stats); we default to the same, so BN here always uses running
averages and the optimizer masks BN params when ``frozen_stages`` covers them.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
}


class _FrozenBN(nn.Module):
    """BatchNorm that always uses running stats (mmdet norm_eval)."""

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = _FrozenBN(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = _FrozenBN(name="bn2")(y)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype, name="downsample_0")(x)
            identity = _FrozenBN(name="downsample_1")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(_FrozenBN(name="bn1")(y))
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_FrozenBN(name="bn2")(y))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = _FrozenBN(name="bn3")(y)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype, name="downsample_0")(x)
            identity = _FrozenBN(name="downsample_1")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    depth: int = 50
    base_channels: int = 64
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        block_type, stage_blocks = ARCH_SETTINGS[self.depth]
        block_cls = BasicBlock if block_type == "basic" else Bottleneck
        expansion = 1 if block_type == "basic" else 4

        x = nn.Conv(self.base_channels, (7, 7), strides=2, padding=3,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_FrozenBN(name="bn1")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        outs = []
        planes = self.base_channels
        for stage, n_blocks in enumerate(stage_blocks):
            stride = 1 if stage == 0 else 2
            for i in range(n_blocks):
                # torch rule: projection shortcut iff stride != 1 or channel
                # change (stage 0 of bottleneck nets changes 64 -> 256)
                x = block_cls(
                    planes=planes,
                    stride=stride if i == 0 else 1,
                    downsample=(i == 0 and (stride != 1 or expansion != 1)),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
