"""Mask2Former query head + RSPrompter query variant (flax, NHWC).

Behavior parity:
  * stock head: reference ``mmdet/models/dense_heads/mask2former_head.py:24``
    (query decoder with masked cross-attention, per-layer cls/mask heads,
    Hungarian point-sampled targets) — used by SAM-seg Mask2Former.
  * RS variant: reference ``RSMask2FormerHead``
    (``mmdet/rsprompter/models.py:275-658``): per-layer ``_forward_head``
    converts each query into ``per_pointset_point`` sparse SAM prompts via a
    3-layer ``point_emb`` MLP (+ interleaved sincos), drives the frozen SAM
    mask decoder once per layer with queries on the point_batch axis;
    ``decoder_plus`` feeds the Mask2Former mask stream (detached) through the
    frozen ``SamMaskEmbedding`` as per-query dense prompts and supervises BOTH
    streams; Hungarian matching runs on ``mask_preds_plus`` (SURVEY A.5).

TPU re-design: per-GT static-shape targets — each (padded) GT row carries its
matched query, losses are masked reductions; Hungarian is a host callback on
tiny (Q, G) matrices; the ``repeat_interleave`` per-query image-token fan-out
becomes the SAM decoder's point_batch axis.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rsprompter_tpu.models.dense_heads.pixel_decoder import (
    MSDeformAttnPixelDecoder,
    _FFN,
)
from rsprompter_tpu.models.layers import sine_positional_encoding
from rsprompter_tpu.models.sam.configs import SamMaskDecoderConfig
from rsprompter_tpu.models.sam.mask_decoder import SamMaskDecoder
from rsprompter_tpu.models.sam.prompt_encoder import SamMaskEmbedding
from rsprompter_tpu.models.sam.configs import SamPromptEncoderConfig
from rsprompter_tpu.models.task_modules.hungarian import (
    bce_cost,
    classification_cost,
    dice_cost,
    hungarian_match_batched,
)
from rsprompter_tpu.ops.point_utils import (
    sample_mask_points_matmul,
    sample_mask_points_shared,
    uncertain_point_coords,
)


class MultiheadAttention(nn.Module):
    """Standard MHA with optional boolean attention mask (True = blocked)."""

    embed_dims: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, query, key, value, attn_mask: Optional[jax.Array] = None):
        b, q, _ = query.shape
        nh = self.num_heads
        hd = self.embed_dims // nh
        qp = nn.Dense(self.embed_dims, dtype=self.dtype, name="q_proj")(query)
        kp = nn.Dense(self.embed_dims, dtype=self.dtype, name="k_proj")(key)
        vp = nn.Dense(self.embed_dims, dtype=self.dtype, name="v_proj")(value)

        def split(x):
            return x.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(qp), split(kp), split(vp)
        scores = jnp.einsum(
            "bntd,bnsd->bnts", qh, kh, preferred_element_type=jnp.float32
        ) / (hd ** 0.5)
        if attn_mask is not None:
            scores = jnp.where(attn_mask, -1e9, scores)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(qh.dtype)
        out = jnp.einsum("bnts,bnsd->bntd", probs, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, q, self.embed_dims)
        return nn.Dense(self.embed_dims, dtype=self.dtype, name="out_proj")(out)


class Mask2FormerDecoderLayer(nn.Module):
    """masked cross-attn -> LN -> self-attn -> LN -> FFN -> LN (post-norm)."""

    embed_dims: int = 128
    num_heads: int = 8
    feedforward_channels: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, query, query_pos, memory, memory_pos, cross_attn_mask):
        attn = MultiheadAttention(
            self.embed_dims, self.num_heads, dtype=self.dtype, name="cross_attn"
        )(query + query_pos, memory + memory_pos, memory, cross_attn_mask)
        query = query + attn
        query = nn.LayerNorm(name="norms_0")(query)
        q = query + query_pos
        attn = MultiheadAttention(
            self.embed_dims, self.num_heads, dtype=self.dtype, name="self_attn"
        )(q, q, query)
        query = query + attn
        query = nn.LayerNorm(name="norms_1")(query)
        query = _FFN(
            self.embed_dims, self.feedforward_channels, dtype=self.dtype, name="ffn"
        )(query)
        query = nn.LayerNorm(name="norms_2")(query)
        return query


class Mask2FormerHead(nn.Module):
    """Query head; ``sam_prompting=True`` -> the RSPrompter query variant."""

    num_classes: int = 1
    num_queries: int = 100
    feat_channels: int = 128
    out_channels: int = 256
    num_transformer_feat_level: int = 3
    num_decoder_layers: int = 6
    num_heads: int = 8
    feedforward_channels: int = 512
    # SAM prompting (RS variant)
    sam_prompting: bool = False
    decoder_config: Optional[SamMaskDecoderConfig] = None
    decoder_plus: bool = True
    per_pointset_point: int = 5
    with_sincos: bool = True
    multimask_output: bool = False
    # loss cfg
    num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    cls_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    bg_cls_weight: float = 0.1
    dtype: Any = None

    def setup(self):
        self.pixel_decoder = MSDeformAttnPixelDecoder(
            feat_channels=self.feat_channels,
            out_channels=self.out_channels,
            num_encoder_levels=self.num_transformer_feat_level,
            num_outs=self.num_transformer_feat_level,
            dtype=self.dtype,
        )
        self.decoder_layers = [
            Mask2FormerDecoderLayer(
                self.feat_channels, self.num_heads, self.feedforward_channels,
                dtype=self.dtype, name=f"transformer_decoder_layers_{i}",
            )
            for i in range(self.num_decoder_layers)
        ]
        self.post_norm = nn.LayerNorm(name="transformer_decoder_post_norm")
        self.query_embed = nn.Embed(self.num_queries, self.feat_channels, name="query_embed")
        self.query_feat = nn.Embed(self.num_queries, self.feat_channels, name="query_feat")
        self.level_embed = nn.Embed(
            self.num_transformer_feat_level, self.feat_channels, name="level_embed"
        )
        if self.sam_prompting:
            # 2-layer MLP classifier (reference replaces the stock Linear)
            self.cls_embed_0 = nn.Dense(self.feat_channels, name="cls_embed_0")
            self.cls_embed_2 = nn.Dense(self.num_classes + 1, name="cls_embed_2")
            num_sincos = 2 if self.with_sincos else 1
            self.point_emb_0 = nn.Dense(self.feat_channels // 2, name="point_emb_0")
            self.point_emb_2 = nn.Dense(self.feat_channels // 2, name="point_emb_2")
            self.point_emb_4 = nn.Dense(
                self.out_channels * num_sincos * self.per_pointset_point,
                name="point_emb_4",
            )
            assert self.decoder_config is not None
            self.mask_decoder = SamMaskDecoder(config=self.decoder_config, dtype=self.dtype)
            if self.decoder_plus:
                self.sam_mask_embed = SamMaskEmbedding(
                    config=SamPromptEncoderConfig(
                        hidden_size=self.decoder_config.hidden_size
                    ),
                    dtype=self.dtype,
                )
                self.mask_embed_0 = nn.Dense(self.feat_channels, name="mask_embed_0")
                self.mask_embed_2 = nn.Dense(self.feat_channels, name="mask_embed_2")
                self.mask_embed_4 = nn.Dense(self.out_channels, name="mask_embed_4")
            else:
                self.no_mask_embed = nn.Embed(
                    1, self.decoder_config.hidden_size, name="no_mask_embed"
                )
        else:
            self.cls_embed = nn.Dense(self.num_classes + 1, name="cls_embed")
            self.mask_embed_0 = nn.Dense(self.feat_channels, name="mask_embed_0")
            self.mask_embed_2 = nn.Dense(self.feat_channels, name="mask_embed_2")
            self.mask_embed_4 = nn.Dense(self.out_channels, name="mask_embed_4")

    # -- heads ---------------------------------------------------------------
    def _mask_embed_mlp(self, x):
        x = nn.relu(self.mask_embed_0(x))
        x = nn.relu(self.mask_embed_2(x))
        return self.mask_embed_4(x)

    def _forward_head(
        self,
        decoder_out: jax.Array,  # (B, Q, C)
        mask_feature: jax.Array,  # (B, H4, W4, out_channels)
        attn_target_hw: Tuple[int, int],
        image_embeddings: Optional[jax.Array],
        image_pe: Optional[jax.Array],
        decode_masks: bool = True,
        return_prompts: bool = False,
    ):
        """``decode_masks=False`` (only legal with ``decoder_plus``, where the
        next layer's attention mask comes from the plus stream) skips the SAM
        decode and returns the plus mask in its slot — predict only consumes
        the LAST layer, so intermediate layers skip 6 of 7 decodes.

        ``return_prompts=True`` (train-time layer-batched decode) also skips
        the per-layer decode but additionally returns the (sparse, dense)
        prompt embeddings so the caller can run ONE SAM decode for all layers
        stacked on the point_batch axis — legal for the same reason as
        ``decode_masks=False``: with ``decoder_plus`` the sequential chain
        (attention masks) never consumes the SAM stream."""
        b, q, _ = decoder_out.shape
        decoder_out = self.post_norm(decoder_out)

        if not self.sam_prompting:
            cls_pred = self.cls_embed(decoder_out)
            mask_embed = self._mask_embed_mlp(decoder_out)
            mask_pred = jnp.einsum(
                "bqc,bhwc->bqhw", mask_embed, mask_feature,
                preferred_element_type=jnp.float32,
            )
            attn_src = mask_pred
            mask_pred_plus = None
        else:
            cls_pred = self.cls_embed_2(nn.relu(self.cls_embed_0(decoder_out)))
            pts = nn.relu(self.point_emb_0(decoder_out))
            pts = nn.relu(self.point_emb_2(pts))
            pts = self.point_emb_4(pts)  # (B, Q, K * C * num_sincos)
            pts = pts.reshape(b, q, self.per_pointset_point, -1)
            if self.with_sincos:
                pts = jnp.sin(pts[..., ::2]) + pts[..., 1::2]
            sparse = pts  # (B, Q, K, C_sam)

            if self.decoder_plus:
                mask_embed = self._mask_embed_mlp(decoder_out)
                mask_pred_plus = jnp.einsum(
                    "bqc,bhwc->bqhw", mask_embed, mask_feature,
                    preferred_element_type=jnp.float32,
                )
                dense_in = jax.lax.stop_gradient(mask_pred_plus)[..., None]
                h4, w4 = dense_in.shape[2:4]
                dense = self.sam_mask_embed(
                    dense_in.reshape(b * q, h4, w4, 1)
                )  # (B*Q, h, w, C_sam)
                dense = dense.reshape(b, q, dense.shape[1], dense.shape[2], -1)
            else:
                mask_pred_plus = None
                s = image_embeddings.shape[1]
                dense = jnp.broadcast_to(
                    self.no_mask_embed.embedding.reshape(1, 1, 1, -1),
                    (b, s, s, self.decoder_config.hidden_size),
                )
            if decode_masks and not return_prompts:
                pe = image_pe
                if pe.shape[0] != b:
                    pe = jnp.broadcast_to(pe, (b,) + pe.shape[1:])
                masks, iou = self.mask_decoder(
                    image_embeddings=image_embeddings,
                    image_positional_embeddings=pe,
                    sparse_prompt_embeddings=sparse,
                    dense_prompt_embeddings=dense,
                    multimask_output=self.multimask_output,
                )  # (B, Q, 1, 4h, 4w)
                mask_pred = masks[:, :, 0]
            else:
                assert self.decoder_plus, "skipping decode needs the plus stream"
                mask_pred = mask_pred_plus  # placeholder; caller must not use
            attn_src = mask_pred_plus if self.decoder_plus else mask_pred
            if return_prompts:
                am = self._next_attn_mask(attn_src, attn_target_hw, b, q)
                return cls_pred, mask_pred, am, mask_pred_plus, (sparse, dense)

        # attention mask for the next decoder layer
        am = self._next_attn_mask(attn_src, attn_target_hw, b, q)
        return cls_pred, mask_pred, am, mask_pred_plus

    def _next_attn_mask(self, attn_src, attn_target_hw, b, q):
        am = jax.image.resize(
            attn_src, attn_src.shape[:2] + tuple(attn_target_hw), method="bilinear"
        )
        am = (jax.nn.sigmoid(am) < 0.5).reshape(b, 1, q, -1)
        # all-background failsafe (reference forward: mask_sum)
        not_all_bg = (~am).sum(-1, keepdims=True) > 0
        am = am & not_all_bg
        am = jnp.broadcast_to(am, (b, self.num_heads, q, am.shape[-1]))
        return jax.lax.stop_gradient(am)

    def __call__(
        self,
        feats: Sequence[jax.Array],
        image_embeddings: Optional[jax.Array] = None,
        image_pe: Optional[jax.Array] = None,
        decode_last_only: bool = False,
        batch_decode: bool = False,
        return_prompts_only: bool = False,
    ):
        """Returns (cls_list, mask_list, mask_plus_list, mask_feature).

        ``decode_last_only`` (predict-time, decoder_plus only): run the SAM
        decode just for the final layer — attention masks come from the plus
        stream, so the 6 intermediate decodes are dead weight at predict.

        ``batch_decode`` (train-time, decoder_plus only): defer every layer's
        SAM decode and run them as ONE decoder call with all layers stacked
        on the point_batch axis (numerically identical — the decoder is
        pointwise over prompts; reference runs 7 sequential decodes at
        models.py:367-378). Cuts per-call overhead and keeps the big image-
        side matmuls at full MXU occupancy.

        ``return_prompts_only`` (train-time, decoder_plus only): skip the SAM
        decode entirely and return the per-layer prompt embeddings in place
        of ``mask_list`` — ``loss()`` Hungarian-matches on the plus stream
        first and then decodes ONLY the matched queries (the SAM-stream loss
        never reads unmatched masks), ~Q/G x less decoder work, exact."""
        b = feats[0].shape[0]
        skip = decode_last_only and self.sam_prompting and self.decoder_plus
        collect = (
            (batch_decode or return_prompts_only)
            and self.sam_prompting and self.decoder_plus and not skip
        )
        mask_feature, memorys = self.pixel_decoder(feats)
        # memorys: low -> high resolution
        mem_tokens, mem_pos, mem_hw = [], [], []
        for i, mem in enumerate(memorys):
            h, w = mem.shape[1:3]
            tok = mem.reshape(b, h * w, -1) + self.level_embed.embedding[i][None, None]
            pe = sine_positional_encoding(h, w, num_feats=self.feat_channels // 2)
            mem_tokens.append(tok)
            mem_pos.append(
                jnp.broadcast_to(pe.reshape(1, h * w, -1), tok.shape).astype(tok.dtype)
            )
            mem_hw.append((h, w))

        query_feat = jnp.broadcast_to(
            self.query_feat.embedding[None], (b, self.num_queries, self.feat_channels)
        )
        query_pos = jnp.broadcast_to(
            self.query_embed.embedding[None], (b, self.num_queries, self.feat_channels)
        )

        cls_list, mask_list, plus_list, prompt_list = [], [], [], []

        def head(qf, hw_idx, decode):
            if collect:
                cls_pred, mask_pred, am, mask_plus, prompts = self._forward_head(
                    qf, mask_feature, mem_hw[hw_idx], image_embeddings,
                    image_pe, return_prompts=True,
                )
                prompt_list.append(prompts)
            else:
                cls_pred, mask_pred, am, mask_plus = self._forward_head(
                    qf, mask_feature, mem_hw[hw_idx], image_embeddings,
                    image_pe, decode_masks=decode,
                )
            cls_list.append(cls_pred)
            mask_list.append(mask_pred)
            plus_list.append(mask_plus)
            return am

        attn_mask = head(query_feat, 0, not skip)
        for i in range(self.num_decoder_layers):
            lvl = i % self.num_transformer_feat_level
            query_feat = self.decoder_layers[i](
                query_feat, query_pos, mem_tokens[lvl], mem_pos[lvl], attn_mask
            )
            attn_mask = head(
                query_feat,
                (i + 1) % self.num_transformer_feat_level,
                (not skip) or i == self.num_decoder_layers - 1,
            )

        if collect and return_prompts_only:
            return cls_list, prompt_list, plus_list, mask_feature
        if collect:
            # one SAM decode for all layers: stack on the point_batch axis
            n_layers = len(prompt_list)
            q = self.num_queries
            sparse_all = jnp.concatenate([s for s, _ in prompt_list], axis=1)
            dense_all = jnp.concatenate([d for _, d in prompt_list], axis=1)
            masks = self._decode_prompts(sparse_all, dense_all,
                                         image_embeddings, image_pe)
            mask_list = [
                masks[:, i * q : (i + 1) * q] for i in range(n_layers)
            ]
        return cls_list, mask_list, plus_list, mask_feature

    def _decode_prompts(self, sparse, dense, image_embeddings, image_pe):
        """(B, N, K, C) sparse + (B, N, h, w, C) dense -> (B, N, 4h, 4w)."""
        b = sparse.shape[0]
        pe = image_pe
        if pe.shape[0] != b:
            pe = jnp.broadcast_to(pe, (b,) + pe.shape[1:])
        masks, _ = self.mask_decoder(
            image_embeddings=image_embeddings,
            image_positional_embeddings=pe,
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=self.multimask_output,
        )  # (B, N, 1, 4h, 4w)
        return masks[:, :, 0]

    # -- loss ----------------------------------------------------------------
    def loss(
        self,
        feats: Sequence[jax.Array],
        gt_labels: jax.Array,  # (B, G)
        gt_masks: jax.Array,  # (B, G, H, W) at batch-input resolution
        gt_valid: jax.Array,  # (B, G)
        rng: jax.Array,
        image_embeddings: Optional[jax.Array] = None,
        image_pe: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        sam_plus = self.sam_prompting and self.decoder_plus
        cls_list, mask_or_prompts, plus_list, _ = self(
            feats, image_embeddings, image_pe,
            return_prompts_only=sam_plus,
        )
        losses: Dict[str, jax.Array] = {}
        n_layers = len(cls_list)
        b, g = gt_labels.shape
        # phase 1: every layer's cost matrix on device, then ONE host
        # callback solves all (layer, image) assignments — on the remote TPU
        # a callback's transport latency dwarfs the scipy solve, so
        # n_layers x B round-trips collapse into one
        costs = []
        for li in range(n_layers):
            lr = jax.random.fold_in(rng, li)
            costs.append(self._match_cost(
                lr, cls_list[li],
                plus_list[li] if sam_plus else mask_or_prompts[li],
                gt_labels, gt_masks, gt_valid,
            ))
        matched_all = hungarian_match_batched(
            jnp.stack(costs),  # (L, B, Q, G)
            jnp.broadcast_to(gt_valid[None], (n_layers,) + gt_valid.shape),
        )
        # phase 2 (decoder_plus): decode ONLY the matched queries' prompts —
        # the SAM-stream loss never reads unmatched masks, matching ran on
        # the plus stream, and the attention-mask chain never consumes the
        # SAM stream, so this is exact with ~Q/G x less decoder work than
        # the reference's decode-everything (models.py:367-378)
        matched_masks = [None] * n_layers
        if sam_plus:
            safe_q = jnp.clip(matched_all, 0, self.num_queries - 1)  # (L,B,G)
            sp, dn = [], []
            for li in range(n_layers):
                s, d = mask_or_prompts[li]  # (B,Q,K,C) / (B,Q,h,w,C)
                sq = safe_q[li]
                sp.append(jnp.take_along_axis(s, sq[:, :, None, None], axis=1))
                dn.append(jnp.take_along_axis(
                    d, sq[:, :, None, None, None], axis=1
                ))
            decoded = self._decode_prompts(
                jnp.concatenate(sp, axis=1), jnp.concatenate(dn, axis=1),
                image_embeddings, image_pe,
            )  # (B, L*G, 4h, 4w)
            matched_masks = [
                decoded[:, li * g : (li + 1) * g] for li in range(n_layers)
            ]
        # phase 3: per-layer losses under the precomputed matches
        for li in range(n_layers):
            lr = jax.random.fold_in(rng, li)
            layer_losses = self._loss_single(
                lr, cls_list[li],
                matched_masks[li] if sam_plus else mask_or_prompts[li],
                plus_list[li],
                gt_labels, gt_masks, gt_valid, matched_all[li],
                mask_pred_matched=sam_plus,
            )
            prefix = "" if li == n_layers - 1 else f"d{li}."
            for k, v in layer_losses.items():
                losses[f"{prefix}{k}"] = v
        return losses

    def _match_cost(self, rng, cls_pred, match_src, gt_labels, gt_masks, gt_valid):
        """(B, Q, G) Hungarian cost on shared random points (device-side)."""
        b, q = cls_pred.shape[:2]
        g = gt_labels.shape[1]
        r_match, _ = jax.random.split(rng)
        pts = jax.random.uniform(r_match, (b, self.num_points, 2))

        def cost_one(cp, mp, gl, gm, gv, p):
            # all Q preds / G targets sampled at the SAME points -> shared-
            # index takes instead of a generic per-(mask, point) gather
            pred_pts = sample_mask_points_shared(mp, p)
            gt_pts = sample_mask_points_shared(gm.astype(jnp.float32), p)
            gt_pts = (gt_pts >= 0.5).astype(jnp.float32)
            cost = (
                self.cls_weight * classification_cost(cp, gl)
                + self.mask_weight * bce_cost(pred_pts, gt_pts)
                + self.dice_weight * dice_cost(pred_pts, gt_pts)
            )
            return jnp.where(gv[None, :], cost, 1e8)

        return jax.vmap(cost_one)(
            jax.lax.stop_gradient(cls_pred),
            jax.lax.stop_gradient(match_src),
            gt_labels, gt_masks, gt_valid, pts,
        )

    def _loss_single(self, rng, cls_pred, mask_pred, mask_plus,
                     gt_labels, gt_masks, gt_valid, matched_q,
                     mask_pred_matched: bool = False):
        """``mask_pred_matched=True``: ``mask_pred`` is already the per-GT
        matched stream (B, G, h, w) — the match-then-decode path."""
        b, q = cls_pred.shape[:2]
        g = gt_labels.shape[1]
        _, r_pts = jax.random.split(rng)

        # --- classification loss (per query) ---
        # invalid GT rows scatter into a dummy extra slot (dropped by slicing)
        bidx = jnp.arange(b)[:, None]
        assigned = gt_valid & (matched_q >= 0)
        scatter_q = jnp.where(assigned, jnp.clip(matched_q, 0, q - 1), q)
        labels = jnp.full((b, q + 1), self.num_classes, jnp.int32)
        labels = labels.at[bidx, scatter_q].set(gt_labels.astype(jnp.int32))
        labels = labels[:, :q]
        safe_q = jnp.clip(matched_q, 0, q - 1)
        logp = jax.nn.log_softmax(cls_pred.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        cw = jnp.where(labels == self.num_classes, self.bg_cls_weight, 1.0)
        loss_cls = self.cls_weight * (nll * cw).sum() / jnp.maximum(cw.sum(), 1.0)

        # --- per-GT mask losses ---
        num_total = jnp.maximum(gt_valid.sum().astype(jnp.float32), 1.0)
        gvalid = gt_valid & (matched_q >= 0)

        def gt_stream(preds, pre_matched=False):
            # preds (B, Q, h, w) -> matched (B, G, h, w)
            matched = preds if pre_matched else jnp.take_along_axis(
                preds, safe_q[:, :, None, None], axis=1
            )
            flat = matched.reshape((b * g,) + matched.shape[2:])
            # all three samplers run as MXU one-hot matmuls: the generic
            # per-(mask, point) gather is ~50 ns/point on TPU and dominated
            # the whole train step (scripts/perf_point_loss.py)
            coords = uncertain_point_coords(
                r_pts, flat, self.num_points, self.oversample_ratio,
                self.importance_sample_ratio, sampler=sample_mask_points_matmul,
            )
            pred_pts = sample_mask_points_matmul(flat, coords)
            tgt_pts = sample_mask_points_matmul(
                gt_masks.reshape((b * g,) + gt_masks.shape[2:]).astype(jnp.float32),
                coords,
            )
            tgt_pts = (tgt_pts >= 0.5).astype(jnp.float32)
            return pred_pts, tgt_pts

        def mask_losses(preds, suffix, pre_matched=False):
            pred_pts, tgt_pts = gt_stream(preds, pre_matched)
            w = gvalid.reshape(-1).astype(jnp.float32)
            # dice (naive, eps=1)
            p = jax.nn.sigmoid(pred_pts)
            num = 2 * (p * tgt_pts).sum(-1)
            den = p.sum(-1) + tgt_pts.sum(-1)
            dice = 1 - (num + 1.0) / (den + 1.0)
            loss_dice = self.dice_weight * (dice * w).sum() / num_total
            bce = (
                jnp.maximum(pred_pts, 0)
                - pred_pts * tgt_pts
                + jnp.log1p(jnp.exp(-jnp.abs(pred_pts)))
            ).mean(-1)
            loss_mask = self.mask_weight * (bce * w).sum() / jnp.maximum(w.sum(), 1.0)
            return {f"loss_mask{suffix}": loss_mask, f"loss_dice{suffix}": loss_dice}

        out = {"loss_cls": loss_cls}
        out.update(mask_losses(mask_pred, "", pre_matched=mask_pred_matched))
        if self.sam_prompting and self.decoder_plus:
            out.update(mask_losses(mask_plus, "_plus"))
        return out

    def predict(
        self,
        feats: Sequence[jax.Array],
        image_embeddings: Optional[jax.Array] = None,
        image_pe: Optional[jax.Array] = None,
    ):
        """Returns (cls (B, Q, C+1), masks (B, Q, h, w)) from the last layer."""
        cls_list, mask_list, _, _ = self(
            feats, image_embeddings, image_pe, decode_last_only=True
        )
        return cls_list[-1], mask_list[-1]
