"""SAM mask decoder: two-way transformer + upscaler + hypernetworks (flax, NHWC).

Parity target: HF ``SamMaskDecoder`` / ``SamTwoWayTransformer`` — the frozen
decoder every RSPrompter variant drives (reference
``mmdet/rsprompter/models.py:900-914`` wraps it; hot loop #2 of SURVEY §3.1).

Per two-way block: token self-attn -> token->image cross-attn (downsample
rate 2) -> MLP -> image->token cross-attn; PEs re-added at every layer; final
token->image attn + LN. Tokens = [iou_token, 4 mask_tokens, sparse prompts];
``multimask_output`` selects mask slice 1: vs 0:1 (parity-critical, SURVEY
appendix A.3).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rsprompter_tpu.models.sam.common import (
    FastConvTranspose2x2,
    MLPBlock,
    SamFeedForward,
    SamLayerNorm,
)
from rsprompter_tpu.models.sam.configs import SamMaskDecoderConfig


class SamAttention(nn.Module):
    """MHA with channel downsampling (internal_dim = C / downsample_rate).

    setup-style so the prompt-batched decode paths can reuse the projection
    parameters with different contraction layouts; the parameter tree is
    identical to the original compact form (q_proj/k_proj/v_proj/out_proj).
    """

    config: SamMaskDecoderConfig
    downsample_rate: int = 1
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        cfg = self.config
        internal = cfg.hidden_size // self.downsample_rate
        self._internal = internal
        self._nh = cfg.num_attention_heads
        self._hd = internal // self._nh
        self.q_proj = nn.Dense(internal, dtype=self.dtype)
        self.k_proj = nn.Dense(internal, dtype=self.dtype)
        self.v_proj = nn.Dense(internal, dtype=self.dtype)
        self.out_proj = nn.Dense(cfg.hidden_size, dtype=self.dtype)

    def _split(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self._nh, self._hd).transpose(0, 2, 1, 3)

    def __call__(self, query, key, value):
        """query/key/value: (B, T, C) -> (B, Tq, C)."""
        nh, hd = self._nh, self._hd
        q = self._split(self.q_proj(query))
        k = self._split(self.k_proj(key))
        v = self._split(self.v_proj(value))
        scores = jnp.einsum(
            "bntd,bnsd->bnts", q, k, preferred_element_type=jnp.float32
        ) / (hd ** 0.5)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bnts,bnsd->bntd", probs, v)
        b, _, t, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self._internal)
        return self.out_proj(out)

    def _head_expansion(self, dtype):
        """Static (nh, hd, internal) one-hot: E[h, d, h*hd+d] = 1.

        Embeds per-head token projections block-diagonally into the full
        internal width so attention against image-sized tensors runs as ONE
        full-lane matmul per side — no (B*P, nh, S, hd) transposes of the
        image state, and the hd=16 contraction (128/8 heads) never touches
        the MXU (it rides the one-hot embed on tiny token tensors instead).
        """
        import numpy as np

        nh, hd = self._nh, self._hd
        e = np.zeros((nh, hd, nh * hd), np.float32)
        for h_ in range(nh):
            e[h_, np.arange(hd), h_ * hd + np.arange(hd)] = 1.0
        return jnp.asarray(e, dtype)

    def tokens_to_image_blockdiag(self, q_tok, img_k, img_v):
        """Token-queries-image attention without per-head image transposes.

        q_tok: (N, T, C); img_k/img_v: (N, S, C). Returns (N, T, C).
        Identical math to ``__call__`` (same per-head contractions, fp32
        accumulation); the per-head structure is expressed by embedding the
        T token queries block-diagonally as (N, T*nh, internal) so scores
        come from one (N, S, internal) x (N, T*nh, internal) contraction.
        """
        nh, hd = self._nh, self._hd
        n, t, _ = q_tok.shape
        q = self.q_proj(q_tok)  # (N, T, internal)
        k = self.k_proj(img_k)  # (N, S, internal)
        v = self.v_proj(img_v)
        e = self._head_expansion(q.dtype)
        q_exp = jnp.einsum(
            "nthd,hdc->nthc", q.reshape(n, t, nh, hd), e
        ).reshape(n, t * nh, self._internal)
        scores = jnp.einsum(
            "nsc,nqc->nsq", k, q_exp, preferred_element_type=jnp.float32
        ) / (hd ** 0.5)  # (N, S, T*nh)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=1).astype(v.dtype)
        out_full = jnp.einsum(
            "nsq,nsc->nqc", probs, v, preferred_element_type=jnp.float32
        ).astype(v.dtype)  # (N, T*nh, internal)
        out = jnp.einsum(
            "nthc,hdc->nthd", out_full.reshape(n, t, nh, self._internal), e
        ).reshape(n, t, self._internal)
        return self.out_proj(out)

    def image_to_tokens_blockdiag(self, img_q, tok_k, tok_v):
        """Image-queries-tokens attention without per-head image transposes.

        img_q: (N, S, C); tok_k/tok_v: (N, T, C). Returns (N, S, C).
        """
        nh, hd = self._nh, self._hd
        n, t, _ = tok_k.shape
        q = self.q_proj(img_q)  # (N, S, internal)
        k = self.k_proj(tok_k)  # (N, T, internal)
        v = self.v_proj(tok_v)
        e = self._head_expansion(q.dtype)
        k_exp = jnp.einsum(
            "nthd,hdc->nthc", k.reshape(n, t, nh, hd), e
        ).reshape(n, t * nh, self._internal)
        v_exp = jnp.einsum(
            "nthd,hdc->nthc", v.reshape(n, t, nh, hd), e
        ).reshape(n, t * nh, self._internal)
        scores = jnp.einsum(
            "nsc,nqc->nsq", q, k_exp, preferred_element_type=jnp.float32
        ) / (hd ** 0.5)  # (N, S, T*nh), minor axis ordered (t, h)
        s_len = img_q.shape[1]
        probs = jax.nn.softmax(
            scores.reshape(n, s_len, t, nh).astype(jnp.float32), axis=2
        ).reshape(n, s_len, t * nh).astype(v.dtype)
        out = jnp.einsum(
            "nsq,nqc->nsc", probs, v_exp, preferred_element_type=jnp.float32
        ).astype(v.dtype)  # (N, S, internal) — zeros off-block make it exact
        return self.out_proj(out)

    def image_to_tokens_shared(self, img_q, tok_k, tok_v):
        """Image->token attention with the IMAGE side shared across prompts.

        img_q: (B, S, C) — queries+pe of the (prompt-independent) image
        state; tok_k/tok_v: (B, P, T, C) per-prompt tokens. Returns the
        per-prompt image update (B, P, S, hidden). Identical math to
        flattening prompts into batch and calling ``__call__`` — the image
        q_proj just runs once per image instead of once per prompt."""
        nh, hd = self._nh, self._hd
        b, p, t, _ = tok_k.shape
        q = self._split(self.q_proj(img_q))  # (B, nh, S, hd)
        kh = self.k_proj(tok_k).reshape(b, p, t, nh, hd)
        vh = self.v_proj(tok_v).reshape(b, p, t, nh, hd)
        scores = jnp.einsum(
            "bnsd,bptnd->bpnst", q, kh, preferred_element_type=jnp.float32
        ) / (hd ** 0.5)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bpnst,bptnd->bpnsd", probs, vh)
        s = out.shape[3]
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, p, s, self._internal)
        return self.out_proj(out)


class SamTwoWayAttentionBlock(nn.Module):
    config: SamMaskDecoderConfig
    skip_first_layer_pe: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        cfg = self.config
        self.self_attn = SamAttention(cfg, 1, self.dtype)
        self.layer_norm1 = SamLayerNorm(eps=cfg.layer_norm_eps)
        self.cross_attn_token_to_image = SamAttention(
            cfg, cfg.attention_downsample_rate, self.dtype
        )
        self.layer_norm2 = SamLayerNorm(eps=cfg.layer_norm_eps)
        self.mlp = MLPBlock(
            mlp_dim=cfg.mlp_dim, hidden_size=cfg.hidden_size, dtype=self.dtype
        )
        self.layer_norm3 = SamLayerNorm(eps=cfg.layer_norm_eps)
        self.cross_attn_image_to_token = SamAttention(
            cfg, cfg.attention_downsample_rate, self.dtype
        )
        self.layer_norm4 = SamLayerNorm(eps=cfg.layer_norm_eps)

    def __call__(self, queries, keys, query_pe, key_pe):
        # (1) token self-attention
        if self.skip_first_layer_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.layer_norm1(queries)

        # (2) token -> image cross-attention (block-diagonal head packing:
        # the image tensors never transpose per head)
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + self.cross_attn_token_to_image.tokens_to_image_blockdiag(
            q, k, keys
        )
        queries = self.layer_norm2(queries)

        # (3) MLP on tokens
        queries = queries + self.mlp(queries)
        queries = self.layer_norm3(queries)

        # (4) image -> token cross-attention
        q = queries + query_pe
        k = keys + key_pe
        attn_out = self.cross_attn_image_to_token.image_to_tokens_blockdiag(
            k, q, queries
        )
        keys = keys + attn_out
        keys = self.layer_norm4(keys)
        return queries, keys

    def shared_first(self, queries, keys, query_pe, key_pe):
        """First block with the image side SHARED across prompts: keys/key_pe
        are (B, S, C) (prompt-independent until this block's image->token
        update), queries/query_pe (B, P, T, C). The per-prompt image state
        only materializes at step (4) — the t2i k/v projections and the i2t
        image q projection run once per IMAGE instead of once per prompt
        (P ~ 100 at predict time). Math identical to broadcasting keys to
        (B*P, S, C) and running ``__call__``."""
        b, p, t, c = queries.shape
        flat = lambda x: x.reshape(b * p, t, c)
        unflat = lambda x: x.reshape(b, p, t, c)

        # (1) token self-attention (per prompt; tokens are tiny)
        if self.skip_first_layer_pe:
            queries = unflat(self.self_attn(flat(queries), flat(queries), flat(queries)))
        else:
            q = flat(queries + query_pe)
            queries = queries + unflat(self.self_attn(q, q, flat(queries)))
        queries = self.layer_norm1(queries)

        # (2) token -> image: prompts ride the query-token axis; image-side
        # k/v projections see (B, S, C) once
        q = (queries + query_pe).reshape(b, p * t, c)
        k = keys + key_pe
        attn = self.cross_attn_token_to_image(q, k, keys).reshape(b, p, t, c)
        queries = self.layer_norm2(queries + attn)

        # (3) MLP on tokens
        queries = self.layer_norm3(queries + self.mlp(queries))

        # (4) image -> token: per-prompt image update (keys become (B,P,S,C))
        attn_out = self.cross_attn_image_to_token.image_to_tokens_shared(
            k, queries + query_pe, queries
        )
        keys_pp = keys[:, None] + attn_out
        keys_pp = self.layer_norm4(keys_pp)
        return queries, keys_pp


class SamTwoWayTransformer(nn.Module):
    config: SamMaskDecoderConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, point_embeddings, image_embeddings, image_pe, shared=False):
        """point_embeddings (B, T, C); image_embeddings/image_pe (B, S, C).

        ``shared=True``: prompt-batched layout — point_embeddings
        (B, P, T, C) with image_embeddings/image_pe (B, S, C) shared across
        prompts. The first block runs with the image side un-broadcast
        (P-fold less image-side projection work); subsequent blocks flatten
        prompts into batch exactly like the reference. Returns
        ((B*P, T, C), (B*P, S, C)) so downstream code is layout-identical."""
        cfg = self.config
        queries = point_embeddings
        keys = image_embeddings
        start = 0
        if shared:
            b, p, t, c = point_embeddings.shape
            queries, keys_pp = SamTwoWayAttentionBlock(
                cfg, skip_first_layer_pe=True, dtype=self.dtype, name="layers_0"
            ).shared_first(queries, keys, point_embeddings, image_pe)
            s = keys_pp.shape[2]
            queries = queries.reshape(b * p, t, c)
            keys = keys_pp.reshape(b * p, s, c)
            point_embeddings = point_embeddings.reshape(b * p, t, c)
            image_pe = jnp.broadcast_to(
                image_pe[:, None], (b, p, s, c)
            ).reshape(b * p, s, c)
            start = 1
        for i in range(start, cfg.num_hidden_layers):
            queries, keys = SamTwoWayAttentionBlock(
                cfg, skip_first_layer_pe=(i == 0), dtype=self.dtype, name=f"layers_{i}"
            )(queries, keys, point_embeddings, image_pe)
        q = queries + point_embeddings
        k = keys + image_pe
        attn_out = SamAttention(
            cfg, cfg.attention_downsample_rate, self.dtype,
            name="final_attn_token_to_image",
        ).tokens_to_image_blockdiag(q, k, keys)
        queries = queries + attn_out
        queries = SamLayerNorm(eps=1e-5, name="layer_norm_final_attn")(queries)
        return queries, keys


class SamMaskDecoder(nn.Module):
    """Predict masks (B, P, M, 4h, 4w) + IoU (B, P, M) from prompts."""

    config: SamMaskDecoderConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        image_embeddings: jax.Array,  # (B, h, w, C)
        image_positional_embeddings: jax.Array,  # (B or 1, h, w, C)
        sparse_prompt_embeddings: Optional[jax.Array],  # (B, P, T, C)
        dense_prompt_embeddings: jax.Array,  # (B, h, w, C) or per-prompt (B, P, h, w, C)
        multimask_output: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        b, h, w, c = image_embeddings.shape
        num_mask_tokens = cfg.num_multimask_outputs + 1

        iou_token = nn.Embed(1, cfg.hidden_size, name="iou_token")
        mask_tokens = nn.Embed(num_mask_tokens, cfg.hidden_size, name="mask_tokens")

        if sparse_prompt_embeddings is not None:
            p = sparse_prompt_embeddings.shape[1]
        else:
            p = 1
        output_tokens = jnp.concatenate(
            [iou_token.embedding, mask_tokens.embedding], axis=0
        )  # (1+M, C)
        output_tokens = jnp.broadcast_to(
            output_tokens[None, None], (b, p, num_mask_tokens + 1, c)
        )
        if sparse_prompt_embeddings is not None:
            tokens = jnp.concatenate(
                [output_tokens, sparse_prompt_embeddings.astype(output_tokens.dtype)],
                axis=2,
            )
        else:
            tokens = output_tokens
        t = tokens.shape[2]

        if dense_prompt_embeddings.ndim == 5:
            # per-prompt dense prompts (the decoder_plus path of the query
            # head): the image state differs per prompt from the start, so
            # prompts flatten into batch immediately
            img = image_embeddings[:, None] + dense_prompt_embeddings
            img = jnp.broadcast_to(img, (b, p, h, w, c)).reshape(b * p, h * w, c)
            pe = jnp.broadcast_to(
                image_positional_embeddings[:, None], (b, p, h, w, c)
            ).reshape(b * p, h * w, c)
            point_emb, img_emb = SamTwoWayTransformer(
                cfg, dtype=self.dtype, name="transformer"
            )(tokens.reshape(b * p, t, c), img, pe)
        else:
            # shared dense prompt (anchor/samdet/point paths): run the first
            # two-way block with the image side un-broadcast — P-fold less
            # image projection work (P ~ 100 at predict time)
            img = (image_embeddings + dense_prompt_embeddings).reshape(b, h * w, c)
            pe = jnp.broadcast_to(
                image_positional_embeddings, (b, h, w, c)
            ).reshape(b, h * w, c)
            point_emb, img_emb = SamTwoWayTransformer(
                cfg, dtype=self.dtype, name="transformer"
            )(tokens, img, pe, shared=True)

        iou_token_out = point_emb[:, 0, :]
        mask_tokens_out = point_emb[:, 1 : 1 + num_mask_tokens, :]

        # upscale image embedding 4x in PACKED block layout: with kernel ==
        # stride the taps never overlap, and LayerNorm/gelu/the hypernetwork
        # product are all per-pixel — so both depth-to-space interleaves are
        # deferred to ONE transpose of the final single-channel masks (the
        # interleaves over (B*P, 2h, 2w, C/4) intermediates dominated the
        # 100-prompt upscale)
        img_sp = img_emb.reshape(b * p, h, w, c)
        up = FastConvTranspose2x2(
            cfg.hidden_size // 4, dtype=self.dtype, name="upscale_conv1",
            packed=True,
        )(img_sp)  # (B*P, h, w, 2, 2, C/4) — (dy1, dx1) minor
        up = SamLayerNorm(name="upscale_layer_norm")(up)
        up = nn.gelu(up, approximate=False)
        up = up.reshape(b * p, h, w * 4, cfg.hidden_size // 4)
        up = FastConvTranspose2x2(
            cfg.hidden_size // 8, dtype=self.dtype, name="upscale_conv2",
            packed=True,
        )(up)  # (B*P, h, w*4, 2, 2, C/8) — w axis unpacks to (w, dy1, dx1)
        up = nn.gelu(up, approximate=False)

        # only the RETURNED mask tokens go through the expensive hypernetwork
        # product (multimask_output selects slice 1: vs 0:1 — SURVEY A.3);
        # all hypernetwork modules still run on their tiny token inputs so
        # the parameter tree is unchanged
        sel = slice(1, None) if multimask_output else slice(0, 1)
        hyper_in = jnp.stack(
            [
                SamFeedForward(
                    hidden_dim=cfg.hidden_size,
                    output_dim=cfg.hidden_size // 8,
                    num_layers=3,
                    dtype=self.dtype,
                    name=f"output_hypernetworks_mlps_{i}",
                )(mask_tokens_out[:, i, :])
                for i in range(num_mask_tokens)
            ],
            axis=1,
        )  # (B*P, M, C/8)
        m_sel = len(range(num_mask_tokens)[sel])

        up_flat = up.reshape(b * p, 4 * h * 4 * w, cfg.hidden_size // 8)
        masks = jnp.einsum(
            "bmc,bsc->bms", hyper_in[:, sel], up_flat,
            preferred_element_type=jnp.float32,
        )
        # packed pixel order: (i, j, dy1, dx1, dy2, dx2) with true position
        # (4i + 2 dy1 + dy2, 4j + 2 dx1 + dx2) — one interleave of the final
        # fp32 masks
        masks = masks.reshape(b * p, m_sel, h, w, 2, 2, 2, 2)
        masks = masks.transpose(0, 1, 2, 4, 6, 3, 5, 7).reshape(
            b, p, m_sel, 4 * h, 4 * w
        )

        iou_pred = SamFeedForward(
            hidden_dim=cfg.iou_head_hidden_dim,
            output_dim=num_mask_tokens,
            num_layers=cfg.iou_head_depth,
            dtype=self.dtype,
            name="iou_prediction_head",
        )(iou_token_out).reshape(b, p, num_mask_tokens)

        return masks, iou_pred[:, :, sel]
