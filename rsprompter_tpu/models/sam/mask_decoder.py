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

from rsprompter_tpu.models.sam.common import MLPBlock, SamFeedForward, SamLayerNorm
from rsprompter_tpu.models.sam.configs import SamMaskDecoderConfig


class SamAttention(nn.Module):
    """MHA with channel downsampling (internal_dim = C / downsample_rate)."""

    config: SamMaskDecoderConfig
    downsample_rate: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, query, key, value):
        """query/key/value: (B, T, C) -> (B, Tq, C)."""
        cfg = self.config
        internal = cfg.hidden_size // self.downsample_rate
        nh = cfg.num_attention_heads
        hd = internal // nh
        q = nn.Dense(internal, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(internal, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(internal, dtype=self.dtype, name="v_proj")(value)

        def split_heads(x):
            b, t, _ = x.shape
            return x.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scores = jnp.einsum(
            "bntd,bnsd->bnts", q, k, preferred_element_type=jnp.float32
        ) / (hd ** 0.5)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bnts,bnsd->bntd", probs, v)
        b, _, t, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, t, internal)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(out)


class SamTwoWayAttentionBlock(nn.Module):
    config: SamMaskDecoderConfig
    skip_first_layer_pe: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        cfg = self.config
        # (1) token self-attention
        if self.skip_first_layer_pe:
            queries = SamAttention(cfg, 1, self.dtype, name="self_attn")(
                queries, queries, queries
            )
        else:
            q = queries + query_pe
            attn_out = SamAttention(cfg, 1, self.dtype, name="self_attn")(q, q, queries)
            queries = queries + attn_out
        queries = SamLayerNorm(eps=cfg.layer_norm_eps, name="layer_norm1")(queries)

        # (2) token -> image cross-attention
        q = queries + query_pe
        k = keys + key_pe
        attn_out = SamAttention(
            cfg, cfg.attention_downsample_rate, self.dtype, name="cross_attn_token_to_image"
        )(q, k, keys)
        queries = queries + attn_out
        queries = SamLayerNorm(eps=cfg.layer_norm_eps, name="layer_norm2")(queries)

        # (3) MLP on tokens
        mlp_out = MLPBlock(
            mlp_dim=cfg.mlp_dim, hidden_size=cfg.hidden_size, dtype=self.dtype, name="mlp"
        )(queries)
        queries = queries + mlp_out
        queries = SamLayerNorm(eps=cfg.layer_norm_eps, name="layer_norm3")(queries)

        # (4) image -> token cross-attention
        q = queries + query_pe
        k = keys + key_pe
        attn_out = SamAttention(
            cfg, cfg.attention_downsample_rate, self.dtype, name="cross_attn_image_to_token"
        )(k, q, queries)
        keys = keys + attn_out
        keys = SamLayerNorm(eps=cfg.layer_norm_eps, name="layer_norm4")(keys)
        return queries, keys


class SamTwoWayTransformer(nn.Module):
    config: SamMaskDecoderConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, point_embeddings, image_embeddings, image_pe):
        """point_embeddings (B, T, C); image_embeddings/image_pe (B, S, C)."""
        cfg = self.config
        queries = point_embeddings
        keys = image_embeddings
        for i in range(cfg.num_hidden_layers):
            queries, keys = SamTwoWayAttentionBlock(
                cfg, skip_first_layer_pe=(i == 0), dtype=self.dtype, name=f"layers_{i}"
            )(queries, keys, point_embeddings, image_pe)
        q = queries + point_embeddings
        k = keys + image_pe
        attn_out = SamAttention(
            cfg, cfg.attention_downsample_rate, self.dtype,
            name="final_attn_token_to_image",
        )(q, k, keys)
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
            # per-prompt dense prompts (the decoder_plus path of the query head)
            img = image_embeddings[:, None] + dense_prompt_embeddings
        else:
            img = (image_embeddings + dense_prompt_embeddings)[:, None]
        # broadcast per-prompt: (B, P, h*w, C), flatten prompts into batch
        img = jnp.broadcast_to(img, (b, p, h, w, c)).reshape(b * p, h * w, c)
        pe = jnp.broadcast_to(
            image_positional_embeddings[:, None], (b, p, h, w, c)
        ).reshape(b * p, h * w, c)
        tokens_flat = tokens.reshape(b * p, t, c)

        point_emb, img_emb = SamTwoWayTransformer(
            cfg, dtype=self.dtype, name="transformer"
        )(tokens_flat, img, pe)

        iou_token_out = point_emb[:, 0, :]
        mask_tokens_out = point_emb[:, 1 : 1 + num_mask_tokens, :]

        # upscale image embedding 4x: (B*P, h, w, C) -> (B*P, 4h, 4w, C/8)
        img_sp = img_emb.reshape(b * p, h, w, c)
        up = nn.ConvTranspose(
            cfg.hidden_size // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="upscale_conv1",
        )(img_sp)
        up = SamLayerNorm(name="upscale_layer_norm")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(
            cfg.hidden_size // 8, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="upscale_conv2",
        )(up)
        up = nn.gelu(up, approximate=False)  # (B*P, 4h, 4w, C/8)

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

        up_flat = up.reshape(b * p, 4 * h * 4 * w, cfg.hidden_size // 8)
        masks = jnp.einsum(
            "bmc,bsc->bms", hyper_in, up_flat, preferred_element_type=jnp.float32
        ).reshape(b, p, num_mask_tokens, 4 * h, 4 * w)

        iou_pred = SamFeedForward(
            hidden_dim=cfg.iou_head_hidden_dim,
            output_dim=num_mask_tokens,
            num_layers=cfg.iou_head_depth,
            dtype=self.dtype,
            name="iou_prediction_head",
        )(iou_token_out).reshape(b, p, num_mask_tokens)

        if multimask_output:
            return masks[:, :, 1:], iou_pred[:, :, 1:]
        return masks[:, :, 0:1], iou_pred[:, :, 0:1]
