"""In-context ablation of the query-family DEVICE predict @1024^2 bs2.

Same method as scripts/perf_pred_device.py (scan-chained, transfer-free,
monkeypatch components to near-no-ops):

  full        unmodified
  noenc       vision encoder -> zeros(+mean) features (isolates the ViT)
  nodecoder   SamMaskDecoder -> zeros (the per-query SAM decode)
  nopixdec    MSDeformAttnPixelDecoder -> cheap outputs
  nopost      instance_postprocess -> first-k slice (top-k + rescore +
              mask2bbox + per-query upsample isolated)

Usage: [RSPROMPTER_PLATFORM=cpu PRED_BS=1 PRED_IMG=256]
       python scripts/perf_query_pred.py [variants...]
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
    import rsprompter_tpu.models.dense_heads.pixel_decoder as pd
    import rsprompter_tpu.models.detectors.rsprompter_query as rq
    import rsprompter_tpu.models.sam.mask_decoder as md
    import rsprompter_tpu.models.sam.vision_encoder as ve

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
    elif variant == "nodecoder":
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
    elif variant == "nopixdec":
        def fake_pix(self, feats, train=False):
            x = feats[0]
            outs = []
            for f in feats[: self.num_encoder_levels][::-1]:
                outs.append(
                    jnp.zeros(f.shape[:3] + (self.feat_channels,), f.dtype)
                    + f.mean()
                )
            mask_feature = jnp.zeros(
                feats[0].shape[:3] + (self.out_channels,), x.dtype
            ) + x.mean()
            return mask_feature, outs
        patch(pd.MSDeformAttnPixelDecoder, "__call__", fake_pix)
    elif variant == "nopost":
        from rsprompter_tpu.models.roi_heads.bbox_head import DetResult

        def fake_post(cls_pred, mask_pred, num_classes, max_per_image,
                      scale_boxes=1.0):
            k = max_per_image
            scores = jax.nn.softmax(
                cls_pred.astype(jnp.float32), axis=-1
            )[:k, :num_classes].max(axis=-1)
            probs = jax.nn.sigmoid(mask_pred[:k].astype(jnp.float32))
            boxes = jnp.zeros((k, 4), jnp.float32) + probs.mean()
            labels = jnp.zeros((k,), jnp.int32)
            valid = jnp.ones((k,), bool)
            return DetResult(boxes, scores, labels, valid), probs
        patch(rq, "instance_postprocess", fake_post)

    cfg = Config.fromfile("configs/rsprompter/rsprompter_query-nwpu.py")
    model = build_detector(cfg.model)
    b = demo_batch(batch_size=BS, image_size=(IMG, IMG), max_gt=8,
                   num_classes=10)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1),
                           method="loss")
    )()

    # scan-chained device timing (docs/design.md methodology): perturb the
    # carried image with an output-derived epsilon so XLA cannot hoist the
    # loop-invariant predict out of the scan
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
    print(f"{variant:10s} {min(dts)*1e3:8.1f} ms/batch", flush=True)

    for (obj, name), fn in orig.items():
        setattr(obj, name, fn)


if __name__ == "__main__":
    for v in sys.argv[1:] or ["full", "noenc", "nodecoder", "nopixdec",
                              "nopost"]:
        run(v)
