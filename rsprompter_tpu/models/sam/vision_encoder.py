"""SAM ViT image encoder (flax, NHWC).

Parity targets: HF ``SamVisionEncoder`` (the external module wrapped by the
reference at ``mmdet/rsprompter/models.py:763-809``) and its in-repo mirror
``mmpretrain/models/backbones/vit_sam.py:317-697``. ViT-B/L/H: patch embed
16x16 -> abs pos embed -> N transformer layers (windowed attention, window 14,
except ``global_attn_indexes``) -> 1x1 conv + LN + 3x3 conv + LN neck to 256ch.

Emits all per-layer hidden states (embedding output first, ``(depth+1)`` states
in ``b h w c``) for the RSPrompter feature aggregator — the
``output_hidden_states=True`` contract of reference ``models.py:989-1006``.

Dynamic input size: the pos-embed bicubic resize and rel-pos table resize of
``vit_sam.py:576-588,636-662`` happen at trace time from static shapes, so
each input-size bucket compiles once (no in-graph dynamism).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rsprompter_tpu.models.sam.common import MLPBlock, SamLayerNorm
from rsprompter_tpu.models.sam.configs import SamVisionConfig
from rsprompter_tpu.ops.attention import attention_rel_pos
from rsprompter_tpu.ops.fused_mlp import (
    fused_ln_qkv,
    fused_mlp_residual,
    fused_qkv_pair,
    fused_qkv_window_pair,
)
from rsprompter_tpu.ops.fused_vit_attention import (
    fused_qkv_attention,
    fused_qkv_attention_pair,
)


def window_partition(x: jax.Array, window: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """(B, H, W, C) -> (B*nW, window, window, C) with zero padding."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(
    windows: jax.Array, window: int, padded: Tuple[int, int], original: Tuple[int, int]
) -> jax.Array:
    """Inverse of window_partition, cropping the padding."""
    hp, wp = padded
    h, w = original
    c = windows.shape[-1]
    b = windows.shape[0] // ((hp // window) * (wp // window))
    x = windows.reshape(b, hp // window, wp // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    return x[:, :h, :w, :]


class SamPatchEmbeddings(nn.Module):
    """16x16 stride-16 conv patchifier: (B,H,W,3) -> (B,H/16,W/16,C).

    Computed as space-to-depth + one matmul (mathematically identical to the
    strided VALID conv, measured ~8x faster on TPU than the conv lowering);
    the parameter keeps the conv kernel layout for checkpoint parity.
    """

    hidden_size: int
    patch_size: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, pixel_values):
        return _PatchProjection(
            hidden_size=self.hidden_size, patch_size=self.patch_size,
            dtype=self.dtype, name="projection",
        )(pixel_values)


class _PatchProjection(nn.Module):
    """Conv-kernel-shaped params, space-to-depth matmul compute."""

    hidden_size: int
    patch_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        b, hh, ww, ci = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (p, p, ci, self.hidden_size)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.hidden_size,))
        gh, gw = hh // p, ww // p
        dtype = self.dtype or x.dtype
        # grouped by patch ROW: the (W, ci) minor is already contiguous as
        # (gw, p*ci), so each row-group matmul reads contiguously and no
        # 6-D space-to-depth transpose is ever materialized (the lane-3
        # input made that transpose the most expensive op in the patchifier:
        # 1.49 -> 1.06 ms @bs8 1024^2; outputs bit-identical)
        xg = x.reshape(b, gh, p, gw, p * ci).astype(dtype)
        wg = kernel.reshape(p, p * ci, self.hidden_size).astype(dtype)
        y = jnp.einsum("bgrwc,rco->bgwo", xg, wg) + bias.astype(dtype)
        return y


class _LNParams(nn.Module):
    """Declares SamLayerNorm-compatible params (scale/bias) for fused kernels."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class _DenseParams(nn.Module):
    """Declares nn.Dense-compatible params (kernel/bias) for fused kernels."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param(
                "kernel", nn.initializers.lecun_normal(),
                (self.in_features, self.features),
            ),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class _MLPParams(nn.Module):
    """Declares MLPBlock-compatible params (lin1/lin2) for the fused MLP."""

    hidden: int
    mlp_dim: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.hidden, self.mlp_dim, name="lin1")()
        w2, b2 = _DenseParams(self.mlp_dim, self.hidden, name="lin2")()
        return w1, b1, w2, b2


class _HeadMajorDense(nn.Module):
    """Dense with (in, heads*head_dim) params computed as an einsum into the
    head-major layout (B, heads, S, head_dim) the fused kernel consumes.
    Parameter tree is identical to ``nn.Dense`` (kernel/bias) for checkpoint
    parity; the head split happens at trace time.

    ``pack_pairs=True`` emits (B, heads/2, S, 2*head_dim) with two adjacent
    heads side by side in the minor dim — free at the source (adjacent head
    columns regroup by reshape) and lane-dense for the pallas kernels."""

    heads: int  # e.g. 3*num_heads for packed qkv
    head_dim: int
    use_bias: bool = True
    pack_pairs: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, lora=None):
        b, s, c = x.shape
        n, d = self.heads, self.head_dim
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (c, n * d)
        )
        dtype = self.dtype or x.dtype
        y = x.astype(dtype) @ kernel.astype(dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (n * d,))
            y = y + bias.astype(dtype)
        if lora is not None:
            la, lb, scale = lora
            y = y + ((x.astype(dtype) @ la.astype(dtype)) @ lb.astype(dtype)) * scale
        if self.pack_pairs:
            return y.reshape(b, s, n // 2, 2 * d).transpose(0, 2, 1, 3)
        # explicit head-major transpose: cheaper than letting XLA plan the
        # 'bsc,ncd->bnsd' einsum (it emits a lane-hostile 4D transpose)
        return y.reshape(b, s, n, d).transpose(0, 2, 1, 3)


class _HeadMajorProj(nn.Module):
    """Output projection consuming (B, heads, S, head_dim) directly
    (einsum 'bnsd,ndc->bsc'); params identical to ``nn.Dense``."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, n, s, d = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (n * d, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dtype = self.dtype or x.dtype
        wn = kernel.reshape(n, d, self.features).astype(dtype)
        return jnp.einsum("bnsd,ndc->bsc", x.astype(dtype), wn) + bias.astype(dtype)


class SamVisionAttention(nn.Module):
    """Windowed/global MHA with decomposed relative position bias.

    ``lora_rank > 0`` adds a low-rank adapter on the qkv projection — the
    TPU-native equivalent of the reference's peft LoRA
    (``mmdet/rsprompter/models.py:785-799``: r=16, target ["qkv"], alpha=32).
    Adapter params are named ``qkv_lora_a/b`` so the optimizer's
    ``train_paths_override=['lora_']`` trains them inside a frozen backbone.
    """

    hidden_size: int
    num_attention_heads: int
    use_rel_pos: bool
    input_size: Tuple[int, int]  # rel-pos table native size (window or full grid)
    qkv_bias: bool = True
    global_attn: bool = False
    attn_impl: str = "xla"
    lora_rank: int = 0
    lora_alpha: float = 32.0
    safe_softmax: bool = False  # exact max-subtracted softmax in the fused
    # kernels (set for trainable-from-scratch encoders where attention logits
    # can leave the clamp's (-60, 60) exact range; ADVICE r2)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, ln_params=None, grid_window: int = 0):
        """``grid_window > 0``: x is the FULL (unpartitioned) grid; the
        window partition happens inside the qkv kernel's BlockSpec
        (``fused_qkv_window_pair``) — no transpose ever materializes. The
        attention output is unpartitioned back via an XLA reshape that fuses
        into the proj einsum epilogue (measured cheap, perf_win_stack p5-p6).
        """
        b, h, w, c = x.shape
        nh = self.num_attention_heads
        hd = self.hidden_size // nh

        rel_pos_h = rel_pos_w = None
        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, hd)
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, hd)
            )

        lora = None
        if self.lora_rank > 0:
            lora_a = self.param(
                "qkv_lora_a",
                nn.initializers.normal(1.0 / self.lora_rank),
                (c, self.lora_rank),
            )
            lora_b = self.param(
                "qkv_lora_b", nn.initializers.zeros,
                (self.lora_rank, 3 * self.hidden_size),
            )
            lora = (lora_a, lora_b, self.lora_alpha / self.lora_rank)

        if grid_window > 0:
            # transpose-free window path: pad grid -> strip qkv kernel ->
            # pair attention -> proj -> unpartition (fused into the einsum)
            win = grid_window
            pad_h = (win - h % win) % win
            pad_w = (win - w % win) % win
            xp = x
            if pad_h or pad_w:
                xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            hp, wp = h + pad_h, w + pad_w
            wk, bk = _DenseParams(c, 3 * self.hidden_size, name="qkv")()
            dt = self.dtype or x.dtype
            qkv_p = fused_qkv_window_pair(
                xp.astype(dt), wk.astype(dt), bk.astype(dt), 3 * nh, win
            )
            out = fused_qkv_attention_pair(
                qkv_p, rel_pos_h, rel_pos_w, (win, win), self.safe_softmax
            )
            out = _HeadMajorProj(
                features=self.hidden_size, dtype=self.dtype, name="proj"
            )(out)  # (B*nW, win^2, C)
            out = (
                out.reshape(b, hp // win, wp // win, win, win, self.hidden_size)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, hp, wp, self.hidden_size)
            )
            return out[:, :h, :w]

        fused_ok = hd == 64 and (nh % 2 == 0 or h * w <= 512)
        if self.attn_impl == "fused" and fused_ok:
            x2 = x.reshape(b, h * w, c)
            if nh % 2 == 0:
                # PAIR-PACKED lanes end to end (window AND global layers).
                # The 64-lane per-head blocks left every VMEM tile half
                # empty (a pure copy over them cost 1.9 ms window / 2.7 ms
                # global on chip); packing two adjacent heads into 128 lanes
                # is free at the qkv reshape and makes the rel-factor
                # einsum, the kernel DMA, and the output write dense.
                if ln_params is not None:
                    # LN1 fused into the qkv kernel (global layers, no LoRA)
                    ls, lb, eps = ln_params
                    wk, bk = _DenseParams(c, 3 * self.hidden_size, name="qkv")()
                    dt = self.dtype or x.dtype
                    qkv_p = fused_ln_qkv(
                        x2.reshape(b * h * w, c).astype(dt), ls, lb,
                        wk.astype(dt), bk.astype(dt),
                        eps, 3 * nh, b,
                    )
                elif lora is None and self.qkv_bias:
                    # window layers: qkv + pair-major write in one kernel
                    # (no LN inside — windows normalize before zero-padding)
                    wk, bk = _DenseParams(c, 3 * self.hidden_size, name="qkv")()
                    dt = self.dtype or x.dtype
                    qkv_p = fused_qkv_pair(
                        x2.reshape(b * h * w, c).astype(dt),
                        wk.astype(dt), bk.astype(dt), 3 * nh, b,
                    )
                else:
                    qkv_p = _HeadMajorDense(
                        heads=3 * nh, head_dim=hd, use_bias=self.qkv_bias,
                        pack_pairs=True, dtype=self.dtype, name="qkv",
                    )(x2, lora=lora)
                out = fused_qkv_attention_pair(
                    qkv_p, rel_pos_h, rel_pos_w, (h, w), self.safe_softmax
                )
                out = _HeadMajorProj(
                    features=self.hidden_size, dtype=self.dtype, name="proj"
                )(out)
                return out.reshape(b, h, w, self.hidden_size)
            # odd head count (small test configs): per-head kernel layout
            qkv_n = _HeadMajorDense(
                heads=3 * nh, head_dim=hd, use_bias=self.qkv_bias,
                dtype=self.dtype, name="qkv",
            )(x2, lora=lora)
            out = fused_qkv_attention(
                qkv_n, rel_pos_h, rel_pos_w, (h, w), self.safe_softmax
            )
            out = _HeadMajorProj(
                features=self.hidden_size, dtype=self.dtype, name="proj"
            )(out)
            return out.reshape(b, h, w, self.hidden_size)

        qkv = nn.Dense(
            3 * self.hidden_size, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv"
        )(x)
        if lora is not None:
            la, lb, scale = lora
            qkv = qkv + ((x @ la) @ lb) * scale
        qkv = qkv.reshape(b, h * w, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nh, HW, hd)

        impl = "xla" if self.attn_impl == "fused" else self.attn_impl
        out = attention_rel_pos(
            q, k, v, (h, w), rel_pos_h, rel_pos_w, impl=impl
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.hidden_size)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="proj")(out)


class SamVisionLayer(nn.Module):
    """Pre-LN ViT block with optional window partition (window_size>0)."""

    config: SamVisionConfig
    window_size: int
    attn_impl: str = "xla"
    lora_rank: int = 0
    lora_alpha: float = 32.0
    safe_softmax: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        residual = x
        hd = cfg.hidden_size // cfg.num_attention_heads
        ln_params = None
        fuse_ln1 = (
            self.attn_impl == "fused" and self.window_size == 0
            and self.lora_rank == 0 and hd == 64
            and cfg.num_attention_heads % 2 == 0
        )
        # transpose-free window path: the qkv kernel's BlockSpec does the
        # partition (fused_qkv_window_pair); eligible for the even-head
        # pair kernels without LoRA (LoRA keeps the explicit-partition path)
        grid_window = 0
        if (
            self.attn_impl == "fused" and self.window_size > 0 and hd == 64
            and cfg.num_attention_heads % 2 == 0 and self.lora_rank == 0
            and cfg.qkv_bias
        ):
            grid_window = self.window_size
        if fuse_ln1:
            # LN1 runs inside the qkv kernel; declare its params here so the
            # tree matches the SamLayerNorm path exactly
            ls, lb = _LNParams(dim=cfg.hidden_size, name="layer_norm1")()
            ln_params = (ls, lb, cfg.layer_norm_eps)
        else:
            x = SamLayerNorm(eps=cfg.layer_norm_eps, name="layer_norm1")(x)
        if self.window_size > 0 and not grid_window:
            h, w = x.shape[1], x.shape[2]
            x, padded = window_partition(x, self.window_size)
            input_size = (self.window_size, self.window_size)
        else:
            input_size = (x.shape[1], x.shape[2])
        x = SamVisionAttention(
            hidden_size=cfg.hidden_size,
            num_attention_heads=cfg.num_attention_heads,
            use_rel_pos=cfg.use_rel_pos,
            input_size=(cfg.grid_size, cfg.grid_size)
            if self.window_size == 0
            else (self.window_size, self.window_size),
            qkv_bias=cfg.qkv_bias,
            global_attn=self.window_size == 0,
            attn_impl=self.attn_impl,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            safe_softmax=self.safe_softmax,
            dtype=self.dtype,
            name="attn",
        )(x, ln_params=ln_params, grid_window=grid_window)
        del input_size
        if self.window_size > 0 and not grid_window:
            x = window_unpartition(x, self.window_size, padded, (h, w))
        x = residual + x
        if self.attn_impl == "fused":
            # LN2 + MLP + residual in one Pallas kernel (intermediate stays
            # in VMEM; gelu overlaps the matmuls) — same params, same math
            ls, lb = _LNParams(dim=cfg.hidden_size, name="layer_norm2")()
            w1, b1, w2, b2 = _MLPParams(
                hidden=cfg.hidden_size, mlp_dim=cfg.mlp_dim, name="mlp"
            )()
            dt = self.dtype or x.dtype
            y = fused_mlp_residual(
                x.reshape(-1, cfg.hidden_size).astype(dt),
                ls, lb,
                w1.astype(dt), b1.astype(dt), w2.astype(dt), b2.astype(dt),
                cfg.layer_norm_eps,
            )
            return y.reshape(x.shape)
        y = SamLayerNorm(eps=cfg.layer_norm_eps, name="layer_norm2")(x)
        y = MLPBlock(
            mlp_dim=cfg.mlp_dim, hidden_size=cfg.hidden_size, dtype=self.dtype, name="mlp"
        )(y)
        return x + y


class SamVisionNeck(nn.Module):
    """1x1 conv -> LN -> 3x3 conv -> LN, to output_channels (bias-free convs)."""

    output_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.output_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        x = SamLayerNorm(name="layer_norm1")(x)
        x = nn.Conv(
            self.output_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name="conv2",
        )(x)
        x = SamLayerNorm(name="layer_norm2")(x)
        return x


class SamVisionEncoder(nn.Module):
    """Full SAM image encoder.

    __call__(pixel_values NHWC) -> (neck_out (B,h,w,256), hidden_states tuple).
    ``hidden_states[0]`` is the post-pos-embed patch embedding; entry ``i+1``
    is the output of layer ``i`` — matching the reference's
    ``output_hidden_states=True`` indexing (``models.py:989-1006``).
    """

    config: SamVisionConfig
    attn_impl: str = "xla"
    lora_rank: int = 0
    lora_alpha: float = 32.0
    remat: bool = False  # rematerialize each layer's activations in backward
    # (jax.checkpoint; the finetune-memory knob — frozen backbones don't need it)
    safe_softmax: bool = False  # exact softmax in fused kernels (see
    # SamVisionAttention.safe_softmax; enable for from-scratch training)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, pixel_values, output_hidden_states: bool = True):
        cfg = self.config
        x = SamPatchEmbeddings(
            hidden_size=cfg.hidden_size,
            patch_size=cfg.patch_size,
            dtype=self.dtype,
            name="patch_embed",
        )(pixel_values)
        if cfg.use_abs_pos:
            pos_embed = self.param(
                "pos_embed",
                nn.initializers.zeros,
                (1, cfg.grid_size, cfg.grid_size, cfg.hidden_size),
            )
            if pos_embed.shape[1:3] != x.shape[1:3]:
                # dynamic input size: bicubic-resize abs PE (trace-time static)
                pos_embed = jax.image.resize(
                    pos_embed,
                    (1, x.shape[1], x.shape[2], cfg.hidden_size),
                    method="bicubic",
                )
            x = x + pos_embed.astype(x.dtype)

        hidden_states = [x]
        layer_cls = nn.remat(SamVisionLayer) if self.remat else SamVisionLayer
        for i in range(cfg.num_hidden_layers):
            window = 0 if i in cfg.global_attn_indexes else cfg.window_size
            x = layer_cls(
                config=cfg,
                window_size=window,
                attn_impl=self.attn_impl,
                lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha,
                safe_softmax=self.safe_softmax,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x)
            hidden_states.append(x)

        neck_out = SamVisionNeck(
            output_channels=cfg.output_channels, dtype=self.dtype, name="neck"
        )(x)
        if output_hidden_states:
            return neck_out, tuple(hidden_states)
        return neck_out
