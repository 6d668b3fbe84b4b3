"""RSPrompter necks: feature aggregator + ViTDet-style simple FPN (flax, NHWC).

Behavior parity (reference ``mmdet/rsprompter/models.py``):
  * ``RSFPN`` (:918-940): optional aggregator then optional spliter; output
    always a tuple.
  * ``PseudoFeatureAggregator`` (:944-984): 1x1 -> 3x3 -> 3x3 bias-free convs
    with LayerNorm2d, for single-map backbones (peft-512 configs).
  * ``RSFeatureAggregator`` (:988-1057): selects every-other ViT hidden state,
    per-layer 1x1+3x3 down-convs (BN+ReLU) to ``hidden_channels``, residual
    chained 3x3 hidden convs, fusion stack to ``out_channels``.
  * ``RSSimpleFPN`` (:1278-1363): single 256-ch map -> 4 scales via
    (deconv x2, deconv, identity, maxpool) + lateral/fpn convs (LN norm) +
    extra maxpool levels to ``num_outs``.

Flax module names mirror the torch Sequential/ModuleList indices
(``fpn1_0`` -> ``fpn1.0``) so trained reference checkpoints convert
mechanically.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax

from rsprompter_tpu.models.sam.common import FastConvTranspose2x2, SamLayerNorm

_ARCH_CHANNELS = {"base": 768, "large": 1024, "huge": 1280}
_ARCH_DEPTH = {"base": 12, "large": 24, "huge": 32}


def arch_from_name(name: str) -> str:
    for key in ("base", "large", "huge"):
        if key in name:
            return key
    raise ValueError(f"Cannot infer SAM arch from '{name}'")


class _BN(nn.Module):
    """BatchNorm matching torch BatchNorm2d defaults (eps 1e-5, momentum 0.1)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)


class PseudoFeatureAggregator(nn.Module):
    hidden_channels: int = 64
    out_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        (x,) = tuple(inputs) if isinstance(inputs, (list, tuple)) else (inputs,)
        hc, oc = self.hidden_channels, self.out_channels
        x = nn.Conv(hc, (1, 1), use_bias=False, dtype=self.dtype, name="channel_fusion_0")(x)
        x = SamLayerNorm(name="channel_fusion_1")(x)
        x = nn.Conv(hc, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="channel_fusion_2")(x)
        x = SamLayerNorm(name="channel_fusion_3")(x)
        x = nn.Conv(oc, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="channel_fusion_4")(x)
        x = SamLayerNorm(name="channel_fusion_5")(x)
        return x


class RSFeatureAggregator(nn.Module):
    """Multi-layer ViT hidden-state aggregator (the paper's design)."""

    in_channels: str  # hf name, e.g. 'facebook/sam-vit-base'
    hidden_channels: int = 32
    out_channels: int = 256
    select_layers: Tuple[int, ...] = tuple(range(1, 13, 2))
    num_layers: Optional[int] = None  # override for non-standard (test) depths
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], train: bool = False):
        if self.num_layers is not None:
            depth = self.num_layers
        else:
            depth = _ARCH_DEPTH[arch_from_name(self.in_channels)]
        assert len(inputs) == depth + 1, (len(inputs), depth + 1)
        hc = self.hidden_channels

        feats = []
        for idx, i_layer in enumerate(self.select_layers):
            x = inputs[i_layer]  # (B, h, w, C) NHWC already
            x = nn.Conv(hc, (1, 1), dtype=self.dtype, name=f"downconvs_{idx}_0")(x)
            x = _BN(dtype=self.dtype, name=f"downconvs_{idx}_1")(x, train)
            x = nn.relu(x)
            x = nn.Conv(hc, (3, 3), padding=1, dtype=self.dtype, name=f"downconvs_{idx}_3")(x)
            x = _BN(dtype=self.dtype, name=f"downconvs_{idx}_4")(x, train)
            x = nn.relu(x)
            feats.append(x)

        x = None
        for idx, h in enumerate(feats):
            if x is not None:
                h = x + h
            r = nn.Conv(hc, (3, 3), padding=1, dtype=self.dtype, name=f"hidden_convs_{idx}_0")(h)
            r = _BN(dtype=self.dtype, name=f"hidden_convs_{idx}_1")(r, train)
            r = nn.relu(r)
            x = h + r

        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="fusion_conv_0")(x)
        x = _BN(dtype=self.dtype, name="fusion_conv_1")(x, train)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="fusion_conv_3")(x)
        x = _BN(dtype=self.dtype, name="fusion_conv_4")(x, train)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="fusion_conv_6")(x)
        return x


class _ConvModule(nn.Module):
    """conv (bias-free when normed) + LN, mirroring mmcv ConvModule keys."""

    out_channels: int
    kernel: int = 1
    with_norm: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(
            self.out_channels, (self.kernel, self.kernel), padding=pad,
            use_bias=not self.with_norm, dtype=self.dtype, name="conv",
        )(x)
        if self.with_norm:
            x = SamLayerNorm(name="ln")(x)
        return x


class RSSimpleFPN(nn.Module):
    backbone_channel: int = 256
    in_channels: Tuple[int, ...] = (64, 128, 256, 256)
    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.backbone_channel
        # fpn1: deconv x2 (stride 4 total) with LN+GELU between
        y = FastConvTranspose2x2(c // 2, dtype=self.dtype, name="fpn1_0")(x)
        y = SamLayerNorm(name="fpn1_1")(y)
        y = nn.gelu(y, approximate=False)
        y = FastConvTranspose2x2(c // 4, dtype=self.dtype, name="fpn1_3")(y)
        inputs = [y]
        inputs.append(
            FastConvTranspose2x2(c // 2, dtype=self.dtype, name="fpn2_0")(x)
        )
        inputs.append(x)
        inputs.append(nn.max_pool(x, (2, 2), strides=(2, 2)))

        laterals = [
            _ConvModule(self.out_channels, 1, dtype=self.dtype, name=f"lateral_convs_{i}")(inp)
            for i, inp in enumerate(inputs)
        ]
        outs = [
            _ConvModule(self.out_channels, 3, dtype=self.dtype, name=f"fpn_convs_{i}")(lat)
            for i, lat in enumerate(laterals)
        ]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)


class RSFPN(nn.Module):
    """Aggregator -> spliter wrapper; output always a tuple of NHWC maps."""

    feature_aggregator: Optional[nn.Module] = None
    feature_spliter: Optional[nn.Module] = None

    def __call__(self, inputs, train: bool = False):
        x = inputs
        if self.feature_aggregator is not None:
            x = self.feature_aggregator(x, train=train)
        if self.feature_spliter is not None:
            x = self.feature_spliter(x, train=train)
        else:
            x = (x,)
        return x
