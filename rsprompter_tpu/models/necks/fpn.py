"""Standard FPN neck (flax, NHWC) for the SAM-det ResNet detector branch.

Behavior parity: mmdet ``FPN`` as configured by
``configs/rsprompter/_base_/samdet.py`` (in_channels [256,512,1024,2048],
out 256, num_outs 5: lateral 1x1 convs, top-down nearest upsampling, 3x3
output convs, extra stride-2 maxpool level).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]) -> Tuple[jax.Array, ...]:
        n = len(inputs)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_convs_{i}_conv")(inputs[i])
            for i in range(n)
        ]
        for i in range(n - 1, 0, -1):
            up = jax.image.resize(
                laterals[i],
                laterals[i - 1].shape[:1] + laterals[i - 1].shape[1:3]
                + laterals[i].shape[3:],
                method="nearest",
            )
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"fpn_convs_{i}_conv")(laterals[i])
            for i in range(n)
        ]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)
