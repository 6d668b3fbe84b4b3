"""In-context ablation of the query-family loss step @1024^2 bs2.

bf16 + layer-batched SAM decode moved the step only 2.29 -> 2.15 s — the
per-layer-decode hypothesis was wrong. Ablate components by monkeypatching
them to near-no-ops and timing the full jitted loss step:

  full        unmodified
  nodecoder   SamMaskDecoder -> zeros (isolates ALL SAM decode work)
  nomaskemb   SamMaskEmbedding -> zeros (the per-query dense-prompt convs)
  nopixdec    MSDeformAttnPixelDecoder -> cheap conv outputs
  nolosses    loss tensors from preds, but point-sampled losses -> means
  noencoder   vision encoder -> cheap patch-embed-only features

Usage: python scripts/perf_query_parts.py [variants...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rsprompter_tpu.apis.build import build_detector
from rsprompter_tpu.core.config import Config
from rsprompter_tpu.utils.testing import demo_batch

BS = 2
IMG = 1024


def _time_host(fn, *args, warmup=5, reps=10):
    for _ in range(warmup):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])[...]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])[...]
    return (time.perf_counter() - t0) / reps


def run(variant):
    import rsprompter_tpu.models.sam.mask_decoder as md
    import rsprompter_tpu.models.sam.prompt_encoder as pe
    import rsprompter_tpu.models.dense_heads.pixel_decoder as pd
    import rsprompter_tpu.ops.point_utils as pu

    orig = {}

    def patch(obj, name, fn):
        orig[(obj, name)] = getattr(obj, name)
        setattr(obj, name, fn)

    if variant == "nodecoder":
        def fake_decode(self, image_embeddings, image_positional_embeddings,
                        sparse_prompt_embeddings, dense_prompt_embeddings,
                        multimask_output=False):
            b = image_embeddings.shape[0]
            h = image_embeddings.shape[1]
            p = (sparse_prompt_embeddings.shape[1]
                 if sparse_prompt_embeddings is not None else 1)
            scale = (sparse_prompt_embeddings.mean()
                     + dense_prompt_embeddings.mean()).astype(jnp.float32)
            masks = jnp.zeros((b, p, 1, 4 * h, 4 * h), jnp.float32) + scale
            iou = jnp.zeros((b, p, 1), jnp.float32)
            return masks, iou
        patch(md.SamMaskDecoder, "__call__", fake_decode)
    elif variant == "nomaskemb":
        def fake_embed(self, masks):
            b = masks.shape[0]
            h = masks.shape[1] // 4
            c = self.config.hidden_size
            return jnp.zeros((b, h, w_ := h, c), masks.dtype) + masks.mean()
        patch(pe.SamMaskEmbedding, "__call__", fake_embed)
    elif variant == "nopixdec":
        def fake_pix(self, feats, train=False):
            x = feats[0]
            b = x.shape[0]
            outs = []
            for i, f in enumerate(feats[: self.num_encoder_levels][::-1]):
                outs.append(
                    jnp.zeros(f.shape[:3] + (self.feat_channels,), f.dtype)
                    + f.mean()
                )
            mask_feature = jnp.zeros(
                feats[0].shape[:3] + (self.out_channels,), x.dtype
            ) + x.mean()
            return mask_feature, outs
        patch(pd.MSDeformAttnPixelDecoder, "__call__", fake_pix)
    elif variant == "nolosses":
        def fake_pts(masks, coords):
            return jnp.broadcast_to(
                masks.mean(axis=(-2, -1), keepdims=False)[..., None],
                masks.shape[:-2] + (coords.shape[-2],),
            )
        patch(pu, "sample_mask_points", fake_pts)
        # also the heads module imported it by name
        import rsprompter_tpu.models.dense_heads.mask2former_head as mh
        patch(mh, "sample_mask_points", fake_pts)

    cfg = Config.fromfile("configs/rsprompter/rsprompter_query-nwpu.py")
    model = build_detector(cfg.model)
    b = demo_batch(batch_size=BS, image_size=(IMG, IMG), max_gt=8, num_classes=10)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1),
                           method="loss")
    )()

    @jax.jit
    def step(params, batch):
        return model.apply(params, batch, jax.random.PRNGKey(2), method="loss",
                           mutable=["batch_stats"])[0]

    dt = _time_host(step, params, batch)
    print(f"{variant:10s} {dt * 1e3:8.1f} ms/step", flush=True)

    for (obj, name), fn in orig.items():
        setattr(obj, name, fn)


if __name__ == "__main__":
    for v in sys.argv[1:] or ["full", "nodecoder", "nopixdec", "nolosses"]:
        run(v)
