"""Fused LN -> lin1 -> gelu -> lin2 -> residual block (TPU Pallas).

The ViT trunk's MLP half is HBM-bound under XLA: the (tokens, mlp_dim)
intermediate round-trips to HBM twice (~400 MB/layer at ViT-B bs8 @1024^2)
and the exact-erf gelu runs as a separate VPU pass (measured 3.4 ms/layer
vs 1.6 ms for the two matmuls alone). This kernel keeps the intermediate in
VMEM (weights stay resident across grid cells) and processes two half-blocks
so Mosaic can overlap one half's VPU gelu with the other half's MXU matmul.

Math is bit-compatible with the flax path
(SamLayerNorm -> MLPBlock -> residual): LN statistics in fp32, matmul
accumulation in fp32 cast to the compute dtype before bias-add, exact
(erf) gelu. Backward is an XLA recompute via ``custom_vjp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LOG2E = 1.4426950408889634


def _erf_f32(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max err 1.5e-7 — far below
    bf16 resolution). Mosaic has no erf/erfc primitive."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp2(-(ax * ax) * _LOG2E)
    return s * y


def _gelu_exact(h):
    """Exact (erf) gelu matching jax.nn.gelu(approximate=False) to bf16."""
    hf = h.astype(jnp.float32)
    g = hf * 0.5 * (1.0 + _erf_f32(hf * 0.7071067811865476))
    return g.astype(h.dtype)


def _ln(xf, scale, bias, eps):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, eps, halves):
    x = x_ref[...]
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    b1 = b1_ref[...]
    b2 = b2_ref[...]
    scale = g_ref[...].astype(jnp.float32)
    bias = b_ref[...].astype(jnp.float32)

    bm = x.shape[0]
    hm = bm // halves
    outs = []
    # independent half-block chains: Mosaic's dataflow scheduler overlaps
    # half A's VPU gelu with half B's MXU matmul
    for j in range(halves):
        xj = x[j * hm : (j + 1) * hm]
        z = _ln(xj.astype(jnp.float32), scale, bias, eps).astype(x.dtype)
        h = jax.lax.dot(z, w1, preferred_element_type=jnp.float32).astype(x.dtype)
        h = h + b1
        g = _gelu_exact(h)
        o = jax.lax.dot(g, w2, preferred_element_type=jnp.float32).astype(x.dtype)
        outs.append(xj + o + b2)
    for j in range(halves):
        o_ref[j * hm : (j + 1) * hm, :] = outs[j]


def _xla_reference(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    z = _ln(x.astype(jnp.float32), ln_scale.astype(jnp.float32),
            ln_bias.astype(jnp.float32), eps).astype(x.dtype)
    h = (z @ w1).astype(x.dtype) + b1
    g = jax.nn.gelu(h, approximate=False)
    return x + (g @ w2).astype(x.dtype) + b2


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_mlp_residual(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=1e-6):
    """x (T, C) -> x + lin2(gelu(lin1(LN(x)))). Weights already in compute
    dtype; LN params any float dtype (stats in fp32 regardless)."""
    return _fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps)


def _block_env(name: str, default: int) -> int:
    """Trace-time block-size override for on-chip in-context A/Bs
    (isolated microbench sweeps rank block sizes differently than the
    composed encoder — only the in-context numbers decide defaults)."""
    import os

    v = os.environ.get(name, "")
    return int(v) if v.isdigit() else default


def _fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, block=None):
    # block sweep on chip @ViT-B bs8: 128 -> 1.84 ms, 256 -> 2.24, 512 -> 2.16
    if block is None:
        block = _block_env("RSPROMPTER_MLP_BLOCK", 128)
    t, c = x.shape
    m = w1.shape[1]
    interpret = jax.devices()[0].platform == "cpu"
    bm = block
    while t % bm:
        bm //= 2
    if bm < 8 or t < 2048:  # tiny/ragged token counts: not worth a kernel
        return _xla_reference(x, ln_scale, ln_bias, w1, b1, w2, b2, eps)
    halves = 2 if bm % 16 == 0 else 1
    kernel = functools.partial(_kernel, eps=eps, halves=halves)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, c), x.dtype),
        grid=(t // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, m), lambda i: (0, 0)),
            pl.BlockSpec((1, m), lambda i: (0, 0)),
            pl.BlockSpec((m, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # resident W1+W2 (9 MB) + fp32 intermediates push past the 16 MB
            # default scoped-vmem limit on some grid sizes; v5e has headroom
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, ln_scale[None, :], ln_bias[None, :], w1, b1[None, :], w2, b2[None, :])


def _ln_qkv_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref, *, eps, pairs3):
    x = x_ref[...]
    scale = g_ref[...].astype(jnp.float32)
    bias = b_ref[...].astype(jnp.float32)
    z = _ln(x.astype(jnp.float32), scale, bias, eps).astype(x.dtype)
    y = jax.lax.dot(z, w_ref[...], preferred_element_type=jnp.float32)
    y = y.astype(x.dtype) + bias_ref[...]
    for j in range(pairs3):
        o_ref[0, j] = y[:, j * 128 : (j + 1) * 128]


def _qkv_pair_kernel(x_ref, w_ref, bias_ref, o_ref, *, pairs3):
    """qkv matmul -> pair-packed head-major write (no LN — the window layers
    normalize BEFORE zero-padding/partition, so LN cannot move inside)."""
    x = x_ref[...]
    y = jax.lax.dot(x, w_ref[...], preferred_element_type=jnp.float32)
    y = y.astype(x.dtype) + bias_ref[...]
    for j in range(pairs3):
        o_ref[0, j] = y[:, j * 128 : (j + 1) * 128]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_qkv_pair(x, w, b, heads3, batch):
    """x (B*S, C) flat (windowed) tokens -> (B, heads3/2, S, 128) pair-packed
    head-major qkv, written lane-dense by the kernel instead of an XLA
    matmul + 4-D transpose over the ~118 MB qkv tensor (the window-layer
    equivalent of :func:`fused_ln_qkv`; measured -0.5 ms/window-layer)."""
    return _qkv_pair_fwd(x, w, b, heads3, batch)


def _qkv_pair_fwd(x, w, b, heads3, batch, block=1024):
    t, c = x.shape
    s = t // batch
    interpret = jax.devices()[0].platform == "cpu"
    bm = block
    while s % bm:
        bm //= 2
    if bm < 8:
        y = (x @ w).astype(x.dtype) + b
        return y.reshape(batch, s, heads3 // 2, 128).transpose(0, 2, 1, 3)
    kernel = functools.partial(_qkv_pair_kernel, pairs3=heads3 // 2)
    blocks_per_b = s // bm
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, heads3 // 2, s, 128), x.dtype),
        grid=(t // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((c, heads3 * 64), lambda i: (0, 0)),
            pl.BlockSpec((1, heads3 * 64), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, heads3 // 2, bm, 128),
            lambda i, bpb=blocks_per_b: (i // bpb, 0, i % bpb, 0),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w, b[None, :])


def _qkv_pair_fwd_vjp(x, w, b, heads3, batch):
    return _qkv_pair_fwd(x, w, b, heads3, batch), (x, w, b)


def _qkv_pair_bwd_vjp(heads3, batch, residuals, g):
    x, w, b = residuals

    def ref(x, w, b):
        t = x.shape[0]
        y = (x @ w).astype(x.dtype) + b
        return y.reshape(batch, t // batch, heads3 // 2, 128).transpose(0, 2, 1, 3)

    _, vjp = jax.vjp(ref, x, w, b)
    return vjp(g)


fused_qkv_pair.defvjp(_qkv_pair_fwd_vjp, _qkv_pair_bwd_vjp)


def _ln_qkv_xla(x, ln_scale, ln_bias, w, b, eps, heads3):
    """XLA fallback/backward reference: returns flat (T, heads3*64)."""
    z = _ln(x.astype(jnp.float32), ln_scale.astype(jnp.float32),
            ln_bias.astype(jnp.float32), eps).astype(x.dtype)
    return (z @ w).astype(x.dtype) + b


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_ln_qkv(x, ln_scale, ln_bias, w, b, eps, heads3, batch):
    """LN -> qkv matmul -> PAIR-PACKED head-major write, in one kernel.

    x: (B*S, C) flat tokens; w: (C, heads3*64), heads3 even. Returns
    (B, heads3/2, S, 128) — two adjacent heads per 128-lane block, the
    layout the pair-packed attention kernels consume — without the XLA-side
    LN round-trip and 5D transpose, and with lane-dense output DMA.
    """
    return _ln_qkv_fwd(x, ln_scale, ln_bias, w, b, eps, heads3, batch)


def _ln_qkv_fwd(x, ln_scale, ln_bias, w, b, eps, heads3, batch, block=None):
    # block sweep on chip @ViT-B bs8 (after the k-tiled global attention
    # landed; the optimum moved): 512 -> 0.41 ms, 256 -> 0.94, 1024 -> 0.93,
    # 2048 -> 1.10; full-encoder A/B confirms 512 (80.31 vs 80.53 ms/fwd).
    # Pre-k-tiled sweep had 1024 -> 0.73, 512 -> 1.04.
    if block is None:
        block = _block_env("RSPROMPTER_LNQKV_BLOCK", 512)
    t, c = x.shape
    s = t // batch
    interpret = jax.devices()[0].platform == "cpu"
    bm = block
    while s % bm:
        bm //= 2
    if bm < 8:
        y = _ln_qkv_xla(x, ln_scale, ln_bias, w, b, eps, heads3)
        return y.reshape(batch, s, heads3 // 2, 128).transpose(0, 2, 1, 3)
    kernel = functools.partial(_ln_qkv_kernel, eps=eps, pairs3=heads3 // 2)
    blocks_per_b = s // bm
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, heads3 // 2, s, 128), x.dtype),
        grid=(t // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, heads3 * 64), lambda i: (0, 0)),
            pl.BlockSpec((1, heads3 * 64), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, heads3 // 2, bm, 128),
            lambda i, bpb=blocks_per_b: (i // bpb, 0, i % bpb, 0),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, ln_scale[None, :], ln_bias[None, :], w, b[None, :])


def _ln_qkv_fwd_vjp(x, ln_scale, ln_bias, w, b, eps, heads3, batch):
    out = _ln_qkv_fwd(x, ln_scale, ln_bias, w, b, eps, heads3, batch)
    return out, (x, ln_scale, ln_bias, w, b)


def _ln_qkv_bwd_vjp(eps, heads3, batch, residuals, g):
    x, ln_scale, ln_bias, w, b = residuals
    t = x.shape[0]
    if (
        _pallas_bwd_enabled()
        and (t // batch) % 256 == 0
    ):
        return _ln_qkv_bwd_pallas(x, ln_scale, ln_bias, w, b, eps, heads3,
                                  batch, g)

    def ref(x, ln_scale, ln_bias, w, b):
        t = x.shape[0]
        y = _ln_qkv_xla(x, ln_scale, ln_bias, w, b, eps, heads3)
        return y.reshape(batch, t // batch, heads3 // 2, 128).transpose(0, 2, 1, 3)

    _, vjp = jax.vjp(ref, x, ln_scale, ln_bias, w, b)
    return vjp(g)


fused_ln_qkv.defvjp(_ln_qkv_fwd_vjp, _ln_qkv_bwd_vjp)


def _ln_stats(xf, eps):
    """LN forward stats in fp32: (xhat, rstd)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return (xf - mu) * rstd, rstd


def _ln_bwd_block(dz, scale, xhat, rstd):
    """Shared LN backward for a token block given precomputed stats:
    returns (dx fp32, dscale-sum, dbias-sum)."""
    dscale = jnp.sum(dz * xhat, axis=0, keepdims=True)
    dbias = jnp.sum(dz, axis=0, keepdims=True)
    dxhat = dz * scale
    dx = rstd * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    return dx, dscale, dbias


def _ln_qkv_bwd_kernel(
    x_ref, g_ref, b_ref, w_ref, dy_ref,
    dx_ref, dsc_ref, dbi_ref, dw_ref, db_ref, *, eps, pairs3
):
    """One token block per cell; the pair-packed cotangent is lane-concat'd
    back to flat (bm, K) IN VMEM (the XLA backward materialized this as an
    HBM transpose of the full qkv tensor). dW/db/LN-param grads accumulate
    in resident fp32 blocks."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dsc_ref[...] = jnp.zeros_like(dsc_ref)
        dbi_ref[...] = jnp.zeros_like(dbi_ref)
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[...]
    scale = g_ref[...].astype(jnp.float32)
    bias = b_ref[...].astype(jnp.float32)
    dy = jnp.concatenate(
        [dy_ref[0, j] for j in range(pairs3)], axis=-1
    ).astype(x.dtype)

    # recompute z (cast-for-cast with _ln_qkv_kernel) for the weight grad
    xhat, rstd = _ln_stats(x.astype(jnp.float32), eps)
    z = (xhat * scale + bias).astype(x.dtype)

    dw_ref[...] += jax.lax.dot_general(
        z, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db_ref[...] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)
    dz = jax.lax.dot_general(
        dy, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx, dsc, dbi = _ln_bwd_block(dz, scale, xhat, rstd)
    dsc_ref[...] += dsc
    dbi_ref[...] += dbi
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _ln_qkv_bwd_pallas(x, ln_scale, ln_bias, w, b, eps, heads3, batch, g,
                       block=512):
    t, c = x.shape
    s = t // batch
    k = heads3 * 64
    pairs3 = heads3 // 2
    bm = block
    while s % bm:
        bm //= 2
    bpb = s // bm
    kernel = functools.partial(_ln_qkv_bwd_kernel, eps=eps, pairs3=pairs3)
    acc = lambda i: (0, 0)  # noqa: E731
    dx, dsc, dbi, dw, db = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((t, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, k), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
        ],
        grid=(t // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), acc),
            pl.BlockSpec((1, c), acc),
            pl.BlockSpec((c, k), acc),
            pl.BlockSpec(
                (1, pairs3, bm, 128),
                lambda i, bpb=bpb: (i // bpb, 0, i % bpb, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), acc),
            pl.BlockSpec((1, c), acc),
            pl.BlockSpec((c, k), acc),
            pl.BlockSpec((1, k), acc),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.devices()[0].platform == "cpu",
    )(x, ln_scale[None, :], ln_bias[None, :], w, g)
    return (
        dx,
        dsc[0].astype(ln_scale.dtype),
        dbi[0].astype(ln_bias.dtype),
        dw.astype(w.dtype),
        db[0].astype(b.dtype),
    )



def _pallas_bwd_enabled() -> bool:
    """RSPROMPTER_PALLAS_BWD: '1' = on (TPU only), 'force' = on even on CPU
    interpret (testing the custom_vjp dispatch end to end), default = off.

    Defaulted OFF after the on-chip A/B (scripts/perf_bwd_kernels.py,
    v5e @1024^2 bs2 anchor train step): Pallas backwards 354.2 ms/step vs
    XLA recompute 352.4 ms/step — a wash. XLA's rematerialized backward is
    already at the same speed, so the simpler path stays the default; the
    kernels remain parity-tested and available via '1'/'force'."""
    import os

    v = os.environ.get("RSPROMPTER_PALLAS_BWD", "0")
    if v == "force":
        return True
    return v == "1" and jax.devices()[0].platform != "cpu"


def _fwd_vjp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    out = _fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _bwd_vjp(eps, residuals, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = residuals
    t = x.shape[0]
    if (
        _pallas_bwd_enabled()
        and t % 128 == 0
        and t >= 2048
    ):
        # TPU: fused Pallas backward (recompute z/h/g in-kernel, weight
        # grads accumulate in resident fp32 VMEM blocks). CPU keeps the XLA
        # recompute; the kernel has its own interpret-mode parity test.
        return _mlp_bwd_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, g)

    def ref(x, ln_scale, ln_bias, w1, b1, w2, b2):
        return _xla_reference(x, ln_scale, ln_bias, w1, b1, w2, b2, eps)

    _, vjp = jax.vjp(ref, x, ln_scale, ln_bias, w1, b1, w2, b2)
    return vjp(g)


fused_mlp_residual.defvjp(_fwd_vjp, _bwd_vjp)


def _gelu_grad_f32(hf):
    """d/dh of exact gelu in fp32: Phi(h) + h * phi(h)."""
    cdf = 0.5 * (1.0 + _erf_f32(hf * 0.7071067811865476))
    pdf = 0.3989422804014327 * jnp.exp2(-(hf * hf) * (0.5 * _LOG2E))
    return cdf + hf * pdf


def _mlp_bwd_kernel(
    x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, do_ref,
    dx_ref, dg_ref, dbb_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *, eps
):
    """One token block per cell; weight/LN-param grads accumulate in
    resident fp32 blocks across the sequential grid sweep (zeroed at i=0).

    Recomputes the forward's z/h/g for the block (flash-style: nothing but
    x and dO read from HBM), then
      dW2 += gelu(h)^T dO            db2 += colsum(dO)
      dh   = (dO W2^T) * gelu'(h)    dW1 += z^T dh,   db1 += colsum(dh)
      dz   = dh W1^T                 LN vjp -> dx_ln, dscale, dbias
      dx   = dO + dx_ln  (residual)
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbb_ref[...] = jnp.zeros_like(dbb_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...]
    do = do_ref[...]
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    scale = g_ref[...].astype(jnp.float32)
    bias = b_ref[...].astype(jnp.float32)

    # forward recompute (matching _kernel/_xla_reference cast-for-cast)
    xhat, rstd = _ln_stats(x.astype(jnp.float32), eps)
    z = (xhat * scale + bias).astype(x.dtype)
    h = jax.lax.dot(z, w1, preferred_element_type=jnp.float32).astype(x.dtype)
    h = h + b1_ref[...]
    hf = h.astype(jnp.float32)
    gel = _gelu_exact(h)

    # second-matmul + gelu backward
    dgl = jax.lax.dot_general(
        do, w2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dw2_ref[...] += jax.lax.dot_general(
        gel, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db2_ref[...] += jnp.sum(do.astype(jnp.float32), axis=0, keepdims=True)
    dh = (dgl * _gelu_grad_f32(hf)).astype(x.dtype)

    # first-matmul backward
    dw1_ref[...] += jax.lax.dot_general(
        z, dh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1_ref[...] += jnp.sum(dh.astype(jnp.float32), axis=0, keepdims=True)
    dz = jax.lax.dot_general(
        dh, w1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    # LN backward (stats from the recompute above)
    dx_ln, dsc, dbi = _ln_bwd_block(dz, scale, xhat, rstd)
    dg_ref[...] += dsc
    dbb_ref[...] += dbi
    dx_ref[...] = (do.astype(jnp.float32) + dx_ln).astype(dx_ref.dtype)


def _mlp_bwd_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, g, block=128):
    t, c = x.shape
    m = w1.shape[1]
    bm = block
    while t % bm:
        bm //= 2
    kernel = functools.partial(_mlp_bwd_kernel, eps=eps)
    acc = lambda i: (0, 0)  # noqa: E731 — resident accumulator blocks
    dx, dsc, dbi, dw1, db1, dw2, db2 = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((t, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((m, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        grid=(t // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), acc),
            pl.BlockSpec((1, c), acc),
            pl.BlockSpec((c, m), acc),
            pl.BlockSpec((1, m), acc),
            pl.BlockSpec((m, c), acc),
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), acc),
            pl.BlockSpec((1, c), acc),
            pl.BlockSpec((c, m), acc),
            pl.BlockSpec((1, m), acc),
            pl.BlockSpec((m, c), acc),
            pl.BlockSpec((1, c), acc),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.devices()[0].platform == "cpu",
    )(x, ln_scale[None, :], ln_bias[None, :], w1, b1[None, :], w2, g)
    return (
        dx,
        dsc[0].astype(ln_scale.dtype),
        dbi[0].astype(ln_bias.dtype),
        dw1.astype(w1.dtype),
        db1[0].astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2[0].astype(b2.dtype),
    )


def _strip_qkv_kernel(x_ref, w_ref, bias_ref, o_ref, *, pairs3, nwin, window):
    """One row-strip of ``nwin`` windows per cell: per-window qkv matmul +
    pair-packed write. The window-partition transpose never materializes —
    it is this kernel's BlockSpec addressing + cheap in-VMEM slices."""
    x = x_ref[0]  # (window, WP, C)
    w = w_ref[...]
    bias = bias_ref[...]
    s = window * window
    for wi in range(nwin):
        xt = x[:, wi * window : (wi + 1) * window, :].reshape(s, x.shape[-1])
        y = jax.lax.dot(xt, w, preferred_element_type=jnp.float32)
        y = y.astype(x.dtype) + bias
        for j in range(pairs3):
            o_ref[wi, j] = y[:, j * 128 : (j + 1) * 128]


def _window_grid_ref(x_grid, w, b, heads3, window):
    """XLA reference (CPU path + backward recompute): explicit partition."""
    b_, hp, wp, c = x_grid.shape
    nh, nw = hp // window, wp // window
    s = window * window
    xw = (
        x_grid.reshape(b_, nh, window, nw, window, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b_ * nh * nw, s, c)
    )
    y = (xw @ w).astype(x_grid.dtype) + b
    return y.reshape(b_ * nh * nw, s, heads3 // 2, 128).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_qkv_window_pair(x_grid, w, b, heads3, window):
    """Windowed qkv from the PADDED GRID: (B, HP, WP, C) -> pair-packed
    (B*nW, heads3//2, window^2, 128).

    Round-3 finding (scripts/perf_win_stack.py): the window-partition
    transpose cost ~1.1 ms/layer in-context because its consumer was opaque
    to XLA fusion (and ``fused_qkv_pair`` silently fell back to the XLA
    matmul for the 196-token windows). Reading row-strips of windows
    straight off the grid removes the transpose entirely: measured
    ln+partition+qkv+attn 4.22 -> 2.58 ms/layer @bs8 (proto_win_v9, random
    data, bit-exact).
    """
    b_, hp, wp, c = x_grid.shape
    if (
        jax.devices()[0].platform == "cpu"
        or heads3 % 2
        or hp % window
        or wp % window
    ):
        return _window_grid_ref(x_grid, w, b, heads3, window)
    nh, nw = hp // window, wp // window
    s = window * window
    pairs3 = heads3 // 2
    kernel = functools.partial(
        _strip_qkv_kernel, pairs3=pairs3, nwin=nw, window=window
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (b_ * nh * nw, pairs3, s, 128), x_grid.dtype
        ),
        grid=(b_, nh),
        in_specs=[
            pl.BlockSpec((1, window, wp, c), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((c, heads3 * 64), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, heads3 * 64), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (nw, pairs3, s, 128), lambda bi, i, nh=nh: (bi * nh + i, 0, 0, 0)
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x_grid, w, b[None, :])


def _qkv_window_fwd_vjp(x_grid, w, b, heads3, window):
    return fused_qkv_window_pair(x_grid, w, b, heads3, window), (x_grid, w, b)


def _qkv_window_bwd_vjp(heads3, window, residuals, g):
    x_grid, w, b = residuals
    b_, hp, wp, _ = x_grid.shape
    if (
        _pallas_bwd_enabled()
        and heads3 % 2 == 0
        and hp % window == 0
        and wp % window == 0
    ):
        return _qkv_window_bwd_pallas(x_grid, w, b, heads3, window, g)

    def ref(x_grid, w, b):
        return _window_grid_ref(x_grid, w, b, heads3, window)

    _, vjp = jax.vjp(ref, x_grid, w, b)
    return vjp(g)


fused_qkv_window_pair.defvjp(_qkv_window_fwd_vjp, _qkv_window_bwd_vjp)


def _strip_qkv_bwd_kernel(
    x_ref, w_ref, dy_ref, dx_ref, dw_ref, db_ref, *, pairs3, nwin, window
):
    """Backward of one row-strip of windows: dX strips write straight back
    to the grid (the XLA backward re-materialized the window-partition
    transposes); dW/db accumulate in resident fp32 blocks."""
    i = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[0]  # (window, WP, C)
    w = w_ref[...]
    s = window * window
    c = x.shape[-1]
    for wi in range(nwin):
        dy = jnp.concatenate(
            [dy_ref[wi, j] for j in range(pairs3)], axis=-1
        ).astype(x.dtype)  # (s, K)
        xt = x[:, wi * window : (wi + 1) * window, :].reshape(s, c)
        dw_ref[...] += jax.lax.dot_general(
            xt, dy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_ref[...] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)
        dxt = jax.lax.dot_general(
            dy, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dx_ref[0, :, wi * window : (wi + 1) * window, :] = dxt.reshape(
            window, window, c
        ).astype(dx_ref.dtype)


def _qkv_window_bwd_pallas(x_grid, w, b, heads3, window, g):
    b_, hp, wp, c = x_grid.shape
    nh, nw = hp // window, wp // window
    s = window * window
    k = heads3 * 64
    pairs3 = heads3 // 2
    kernel = functools.partial(
        _strip_qkv_bwd_kernel, pairs3=pairs3, nwin=nw, window=window
    )
    acc = lambda bi, i: (0, 0)  # noqa: E731
    dx, dw, db = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b_, hp, wp, c), x_grid.dtype),
            jax.ShapeDtypeStruct((c, k), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
        ],
        grid=(b_, nh),
        in_specs=[
            pl.BlockSpec((1, window, wp, c), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((c, k), acc),
            pl.BlockSpec(
                (nw, pairs3, s, 128), lambda bi, i, nh=nh: (bi * nh + i, 0, 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, window, wp, c), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((c, k), acc),
            pl.BlockSpec((1, k), acc),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.devices()[0].platform == "cpu",
    )(x_grid, w, g)
    return dx, dw.astype(w.dtype), db[0].astype(b.dtype)
