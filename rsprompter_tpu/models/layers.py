"""Shared layers: DETR-style sine positional encoding.

Behavior parity: reference ``mmdet/models/layers/positional_encoding.py:15``
(``SinePositionalEncoding`` with ``normalize=True``) — used as the RoI head's
``extra_pe`` (reference ``mmdet/rsprompter/models.py:1375-1381``) and by the
Mask2Former pixel decoder.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sine_positional_encoding(
    h: int,
    w: int,
    num_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * np.pi,
    eps: float = 1e-6,
    offset: float = 0.0,
    dtype=jnp.float32,
):
    """Returns (h, w, 2*num_feats) NHWC positional encoding (no batch dim)."""
    y_embed = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    x_embed = jnp.ones((h, 1)) * jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    if normalize:
        y_embed = (y_embed + offset) / (y_embed[-1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, -1:] + eps) * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    # interleave sin/cos: (..., num_feats) -> sin of even idx, cos of odd idx
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(h, w, num_feats)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(h, w, num_feats)
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)
