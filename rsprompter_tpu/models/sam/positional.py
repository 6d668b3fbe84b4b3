"""SAM random-Fourier positional embedding.

Parity target: HF ``SamPositionalEmbedding`` (used by the reference as
``RSSamPositionalEmbedding``, reference ``mmdet/rsprompter/models.py:745-759``)
and the image-wide PE grid of reference ``models.py:85-95``:
``coords in [0,1] -> 2c-1 -> c @ W -> 2*pi*c -> [sin, cos]``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class SamPositionalEmbedding(nn.Module):
    """Fourier-feature PE with a fixed Gaussian projection matrix.

    The projection matrix is a *buffer* in torch (random at init, loaded from
    checkpoint); here it is a parameter named ``positional_embedding`` with
    shape (2, num_pos_feats) that the optimizer masks out (it belongs to the
    frozen SAM subtree in every reference config).
    """

    num_pos_feats: int = 128
    scale_init: float = 128.0  # hidden_size // 2 in HF

    @nn.compact
    def __call__(self, coords, input_shape: Optional[Tuple[int, int]] = None):
        """coords: (..., 2) in pixel space (if input_shape given) or [0,1]."""
        w = self.param(
            "positional_embedding",
            lambda key, shape: self.scale_init
            * nn.initializers.normal(1.0)(key, shape),
            (2, self.num_pos_feats),
        )
        coords = jnp.asarray(coords, jnp.float32)
        if input_shape is not None:
            h, wdt = input_shape
            coords = coords / jnp.asarray([wdt, h], jnp.float32)
        coords = 2.0 * coords - 1.0
        proj = coords @ w
        proj = 2.0 * np.pi * proj
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def image_wide_positional_embeddings(apply_pe, size: int):
    """Dense PE grid for the image embedding (NHWC: (1, size, size, C)).

    Pixel-center coords via cumsum(ones)-0.5 normalized by size, matching
    reference ``mmdet/rsprompter/models.py:85-95`` / HF
    ``SamModel.get_image_wide_positional_embeddings``. ``apply_pe`` is a bound
    ``SamPositionalEmbedding`` apply function taking (coords,).
    """
    grid = jnp.ones((size, size), jnp.float32)
    y_embed = (jnp.cumsum(grid, axis=0) - 0.5) / size
    x_embed = (jnp.cumsum(grid, axis=1) - 0.5) / size
    coords = jnp.stack([x_embed, y_embed], axis=-1)  # (size, size, 2)
    pe = apply_pe(coords)  # (size, size, C)
    return pe[None]
