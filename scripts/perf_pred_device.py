"""In-context ablation of the anchor-family DEVICE predict @1024^2 bs2.

perf_pred_parts.py splits predict into device compute (~217 ms/batch) vs
host transfer; this script decomposes the device side by monkeypatching
components to near-no-ops and re-timing the scan-chained predict:

  full     unmodified
  noenc    vision encoder -> zeros(+mean) features (isolates the ViT)
  nodec    SamMaskDecoder -> zeros (the 100-detection SAM decode)
  nonms    nms_padded -> plain top-k (no suppression fixpoint); hits both
           the RPN's per-level NMS and the bbox head's class NMS
  noroi    extract_roi_feats -> zeros (RoIAlign 7^2 x1000 + 14^2 x100)
  notopk   jax.lax.top_k -> prefix slice (no sort; RPN per-level top-1000
           over up-to-400k scores + the rcnn prefilter are sort-based)

Usage: python scripts/perf_pred_device.py [variants...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("RSPROMPTER_PLATFORM"):  # e.g. cpu smoke past the axon pin
    jax.config.update("jax_platforms", os.environ["RSPROMPTER_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from rsprompter_tpu.apis.build import build_detector
from rsprompter_tpu.core.config import Config
from rsprompter_tpu.utils.testing import demo_batch

BS = int(os.environ.get("PRED_BS", "2"))
IMG = int(os.environ.get("PRED_IMG", "1024"))


def run(variant):
    import rsprompter_tpu.models.roi_heads.prompt_roi_head as prh
    import rsprompter_tpu.models.roi_heads.roi_extractor as re_mod
    import rsprompter_tpu.models.sam.mask_decoder as md
    import rsprompter_tpu.models.sam.vision_encoder as ve
    import rsprompter_tpu.ops.nms as nms_mod

    orig = {}

    def patch(obj, name, fn):
        orig[(obj, name)] = getattr(obj, name)
        setattr(obj, name, fn)

    if variant == "noenc":
        def fake_encoder(self, images, output_hidden_states=True):
            b = images.shape[0]
            s = self.config.image_size // self.config.patch_size
            c = self.config.hidden_size
            mean = images.mean().astype(jnp.float32)
            emb = jnp.zeros((b, s, s, self.config.output_channels),
                            jnp.float32) + mean
            hs = tuple(
                jnp.zeros((b, s, s, c), jnp.float32) + mean
                for _ in range(self.config.num_hidden_layers + 1)
            )
            return emb, hs
        patch(ve.SamVisionEncoder, "__call__", fake_encoder)
    elif variant == "nodec":
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
    elif variant == "nonms":
        def fake_nms(boxes, scores, iou_thr=0.5, max_out=100, valid=None):
            neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
            if valid is not None:
                scores = jnp.where(valid, scores, neg_inf)
            order = jnp.argsort(-scores)[:max_out]
            keep = jnp.isfinite(scores[order])
            out_boxes = jnp.where(keep[:, None], boxes[order], 0.0)
            out_scores = jnp.where(keep, scores[order], 0.0)
            return order, keep, out_boxes, out_scores
        patch(nms_mod, "nms_padded", fake_nms)
    elif variant == "notwt":
        def fake_twt(self, point_embeddings, image_embeddings, image_pe,
                     shared=False):
            eps = image_pe.mean().astype(point_embeddings.dtype)
            if shared:
                b, p, t, c = point_embeddings.shape
                s = image_embeddings.shape[1]
                q = point_embeddings.reshape(b * p, t, c) + eps
                k = jnp.broadcast_to(
                    image_embeddings[:, None],
                    (b, p, s, c),
                ).reshape(b * p, s, c) + eps
                return q, k
            return point_embeddings + eps, image_embeddings + eps
        patch(md.SamTwoWayTransformer, "__call__", fake_twt)
    elif variant == "noupscale":
        import rsprompter_tpu.models.sam.common as sam_common

        def fake_upconv(self, x):
            b, h, w, _ = x.shape
            return jnp.zeros(
                (b, 2 * h, 2 * w, self.features), x.dtype
            ) + x.mean().astype(x.dtype)
        patch(sam_common.FastConvTranspose2x2, "__call__", fake_upconv)
    elif variant == "notopk":
        def fake_top_k(operand, k):
            # timing-only: prefix slice, descending-ish order not preserved
            vals = jax.lax.slice_in_dim(operand, 0, k, axis=-1)
            idx = jnp.broadcast_to(
                jnp.arange(k, dtype=jnp.int32), vals.shape
            )
            return vals, idx
        patch(jax.lax, "top_k", fake_top_k)
    elif variant == "noroi":
        def fake_roi(feats, rois, out_size, strides, sampling_ratio=0):
            n = rois.shape[0]
            c = feats[0].shape[-1]
            mean = sum(f.mean() for f in feats) + rois.mean() * 0
            return jnp.zeros((n, out_size[0], out_size[1], c),
                             feats[0].dtype) + mean.astype(feats[0].dtype)
        patch(re_mod, "extract_roi_feats", fake_roi)
        patch(prh, "extract_roi_feats", fake_roi)

    cfg = Config.fromfile("configs/rsprompter/rsprompter_anchor-nwpu.py")
    model = build_detector(cfg.model)
    b = demo_batch(batch_size=BS, image_size=(IMG, IMG), max_gt=8, num_classes=10)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1),
                           method="loss")
    )()

    # scan-chained device timing: perturb the carried image with an output-
    # derived epsilon so XLA cannot hoist the loop-invariant predict
    def make_chain(n):
        @jax.jit
        def prog(params, batch):
            def body(img, _):
                bb = dict(batch, images=img)
                dets, probs = model.apply(params, bb, method="predict")
                eps = probs.mean() * 1e-9 + dets.scores.mean() * 1e-9
                return img * (1.0 + eps.astype(img.dtype)), ()
            img, _ = jax.lax.scan(body, batch["images"], None, length=n)
            return img.mean()
        return prog

    lo, hi = make_chain(1), make_chain(4)
    for _ in range(3):
        float(np.asarray(lo(params, batch)))
        float(np.asarray(hi(params, batch)))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(np.asarray(lo(params, batch))); tl = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(hi(params, batch))); th = time.perf_counter() - t0
        dts.append((th - tl) / 3)
    print(f"{variant:8s} {min(dts)*1e3:8.1f} ms/batch", flush=True)

    for (obj, name), fn in orig.items():
        setattr(obj, name, fn)


if __name__ == "__main__":
    for v in sys.argv[1:] or ["full", "noenc", "nodec", "nonms", "noroi",
                              "notopk"]:
        run(v)
