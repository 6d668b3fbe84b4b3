"""ViT attention with decomposed relative position bias.

Behavior parity: the decomposed rel-pos scheme of SAM's image encoder
(reference mirror at ``mmpretrain/models/backbones/vit_sam.py:78-157``; HF
``SamVisionAttention``):

    attn[b,n,(h,w),(k_h,k_w)] += q[b,n,h,w,:] . Rh[h,k_h,:]
                               + q[b,n,h,w,:] . Rw[w,k_w,:]

with Rh/Rw gathered from learned tables of shape (2*S-1, head_dim) and
linearly interpolated when the table length does not match the (static)
spatial size.

Two implementations:
  * ``impl='xla'`` — materialized scores; XLA fuses the bias add into the
    matmul epilogue. Used for windowed layers (seq = 196) and as the CPU /
    reference path.
  * ``impl='flash'`` — Pallas blockwise-softmax kernel for the 4 global
    layers (seq = 4096 at 1024 px) where materializing (B, heads, 4096, 4096)
    scores is HBM-bound. The rank-structured bias is rebuilt per block from
    Rh/Rw inside the kernel. (See ``rsprompter_tpu/ops/flash_attention.py``.)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Gather per-(q,k) relative position embeddings from a (L, d) table.

    Linear-resizes the table when L != 2*max(q,k)-1 (the dynamic-input-size
    path, reference ``mmpretrain/models/backbones/vit_sam.py:78-113``).
    Shapes are static so the resize resolves at trace time.
    """
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear"
        )
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative_coords = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[relative_coords.astype(jnp.int32)]


def decomposed_rel_pos_tables(
    rel_pos_h: jax.Array, rel_pos_w: jax.Array, q_size: Tuple[int, int], k_size: Tuple[int, int]
) -> Tuple[jax.Array, jax.Array]:
    """Resolve the gathered (q, k, d) tables for height and width axes."""
    rh = get_rel_pos(q_size[0], k_size[0], rel_pos_h)
    rw = get_rel_pos(q_size[1], k_size[1], rel_pos_w)
    return rh, rw


def _rel_pos_bias(q: jax.Array, rh: jax.Array, rw: jax.Array, h: int, w: int) -> jax.Array:
    """bias: (B, heads, h, w, kh, kw) from q (B, heads, h*w, d)."""
    b, n, _, d = q.shape
    q_r = q.reshape(b, n, h, w, d)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", q_r, rh)
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", q_r, rw)
    return rel_h[..., :, None] + rel_w[..., None, :]


def attention_rel_pos(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    hw: Tuple[int, int],
    rel_pos_h: Optional[jax.Array] = None,
    rel_pos_w: Optional[jax.Array] = None,
    impl: str = "xla",
) -> jax.Array:
    """Multi-head attention over a (h, w) token grid with optional rel-pos bias.

    Args:
      q, k, v: (B, heads, h*w, head_dim)
      hw: static (h, w) of the token grid.
      rel_pos_h/w: learned tables (L, head_dim) or None.
      impl: 'xla' or 'flash'.

    Returns: (B, heads, h*w, head_dim), dtype of q.
    """
    h, w = hw
    b, n, s, d = q.shape
    assert s == h * w, (s, h, w)
    scale = d ** -0.5

    if impl == "flash":
        from rsprompter_tpu.ops.flash_attention import flash_attention_rel_pos

        return flash_attention_rel_pos(q, k, v, hw, rel_pos_h, rel_pos_w)

    scores = jnp.einsum("bnqd,bnkd->bnqk", q * scale, k, preferred_element_type=jnp.float32)
    if rel_pos_h is not None:
        rh, rw = decomposed_rel_pos_tables(rel_pos_h, rel_pos_w, (h, w), (h, w))
        bias = _rel_pos_bias(q, rh, rw, h, w).reshape(b, n, s, s)
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bnqk,bnkd->bnqd", probs, v)
    return out
