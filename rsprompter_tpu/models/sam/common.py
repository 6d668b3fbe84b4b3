"""Shared SAM building blocks (flax).

Parity targets: HF ``transformers.models.sam.modeling_sam`` (the external
dependency of reference ``mmdet/rsprompter/models.py``): ``SamMLPBlock``,
``SamLayerNorm``, ``SamFeedForward``. Submodule attribute names mirror the
torch parameter tree so checkpoint conversion is mechanical.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class FastConvTranspose2x2(nn.Module):
    """Stride-2 kernel-2 ConvTranspose as one MXU matmul + depth-to-space.

    With kernel == stride the output taps never overlap:
    ``out[b, 2i+di, 2j+dj, o] = Σ_c in[b,i,j,c] · W[di,dj,c,o] + bias`` — a
    plain (B·H·W, C) @ (C, 4·O) matmul followed by a block interleave. XLA's
    generic ConvTranspose lowering (input-dilated convolution) tiles this
    badly on TPU: the upscaler measured 17.7 ms of the 56 ms 100-prompt
    decode (scripts/perf_decode_parts.py). Parameter tree (kernel/bias,
    kernel shape (2, 2, C, O)) is identical to ``nn.ConvTranspose`` so
    checkpoints load unchanged.

    ``packed=True`` skips the depth-to-space interleave and returns the
    block layout ``(b, h, w, 2, 2, O)`` (dy, dx minor). Because the taps of
    a kernel==stride transposed conv never overlap, a following per-pixel op
    (another 2x2 ConvTranspose, LayerNorm over channels, gelu, hypernetwork
    product) is independent of spatial order — chains of packed upscalers
    defer the interleave to one cheap transpose of the final 1-channel
    output (the SAM decoder's 100-prompt upscale spent most of its time in
    the two intermediate interleaves over (P, 2h, 2w, C/4) tensors)."""

    features: int
    dtype: Optional[jnp.dtype] = None
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (2, 2, c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or x.dtype
        # flax ConvTranspose applies the kernel spatially FLIPPED:
        # out[2i+di, 2j+dj] = in[i,j,c] · W[1-di, 1-dj, c, o]
        y = jnp.einsum(
            "bhwc,decf->bhwdef",
            x.astype(dt), kernel[::-1, ::-1].astype(dt),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        if self.packed:
            return y + bias.astype(dt)
        # (b, h, w, 2, 2, f) -> (b, h, 2, w, 2, f) -> (b, 2h, 2w, f)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, self.features)
        return y + bias.astype(dt)


class MLPBlock(nn.Module):
    """Two-layer GELU MLP: lin1 -> gelu -> lin2 (HF SamMLPBlock)."""

    mlp_dim: int
    hidden_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="lin2")(x)
        return x


class SamLayerNorm(nn.Module):
    """Channel-wise LayerNorm over the last axis (NHWC everywhere on TPU).

    The torch counterpart supports channels_first; this framework keeps NHWC
    so it is always a plain last-axis LayerNorm. Also covers the reference's
    ``LN2d`` (reference ``mmdet/rsprompter/models.py:33-50``) since that is
    channel LayerNorm in NCHW.
    """

    eps: float = 1e-6
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class SamFeedForward(nn.Module):
    """ReLU MLP with ``num_layers`` total linear layers (HF SamFeedForward).

    Layout: proj_in -> relu -> [layers_i -> relu]*(num_layers-2) -> proj_out
    (-> sigmoid if sigmoid_output).
    """

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj_in")(x)
        x = nn.relu(x)
        for i in range(self.num_layers - 2):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"layers_{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="proj_out")(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x
