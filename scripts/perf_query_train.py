"""In-context ablation of the query-family FULL TRAIN STEP @1024^2 bs2.

VERDICT r4 weak #7: the query train step (440 ms) is ~1.9x the anchor step
(236 ms) with no published split. Same discipline as the predict ablations
(monkeypatch a component to a near-no-op, re-init, time the full jitted
step) but on the canonical training configuration: fwd+bwd+optimizer with
the config's build_optimizer freeze masks, timed by the scan-slope method
(each iteration's forward depends on the previous param update, so the
chain serializes on device and dispatch constants cancel).

Variants:
  full        unmodified
  noencoder   ViT transformer layers -> identity (frozen: fwd-only cost)
  nopixdec    MSDeformAttnPixelDecoder -> cheap passthrough (fwd+bwd)
  nodecoder   SamMaskDecoder -> zeros (per-layer SAM decode, fwd+bwd)
  nomaskemb   SamMaskEmbedding -> zeros (per-query dense-prompt convs)
  nolosses    point-sampled losses -> mask means
  nomatch     Hungarian/auction matching -> arange assignment

Usage: python scripts/perf_query_train.py [variants...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BS = 2
IMG = 1024


def run(variant):
    import rsprompter_tpu.models.dense_heads.mask2former_head as mh
    import rsprompter_tpu.models.dense_heads.pixel_decoder as pd
    import rsprompter_tpu.models.sam.mask_decoder as md
    import rsprompter_tpu.models.sam.prompt_encoder as pe
    import rsprompter_tpu.models.sam.vision_encoder as ve
    import rsprompter_tpu.ops.point_utils as pu
    from rsprompter_tpu.apis.build import build_detector, freeze_paths_for
    from rsprompter_tpu.core.config import Config
    from rsprompter_tpu.engine.optim import build_optimizer
    from rsprompter_tpu.engine.train_state import TrainState, make_train_step
    from rsprompter_tpu.utils.testing import demo_batch

    orig = {}

    def patch(obj, name, fn):
        orig[(obj, name)] = getattr(obj, name)
        setattr(obj, name, fn)

    if variant == "noencoder":
        def fake_layer(self, x):
            return x * (1.0 + x.mean() * 1e-9).astype(x.dtype)
        patch(ve.SamVisionLayer, "__call__", fake_layer)
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
    elif variant == "nomaskemb":
        def fake_embed(self, masks):
            b = masks.shape[0]
            h = masks.shape[1] // 4
            c = self.config.hidden_size
            return jnp.zeros((b, h, h, c), masks.dtype) + masks.mean()
        patch(pe.SamMaskEmbedding, "__call__", fake_embed)
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
    elif variant == "nolosses":
        def fake_pts(masks, coords):
            return jnp.broadcast_to(
                masks.mean(axis=(-2, -1), keepdims=False)[..., None],
                masks.shape[:-2] + (coords.shape[-2],),
            )
        for name in ("sample_mask_points", "sample_mask_points_shared",
                     "sample_mask_points_matmul"):
            patch(pu, name, fake_pts)
        for name in ("sample_mask_points_shared", "sample_mask_points_matmul"):
            patch(mh, name, fake_pts)
    elif variant in ("sgvalue", "sggrid"):
        # pinpoint the pixel decoder's bwd cost: sgvalue kills the
        # scatter-add grad into the value maps (the take's transpose);
        # sggrid kills the grad through the sampling coordinates (which
        # rematerializes the corner gather in bwd)
        import rsprompter_tpu.ops.msdeform_attn as mda
        real_gs = mda.grid_sample_nhwc
        if variant == "sgvalue":
            def wrapped(img, grid, align_corners=False):
                return real_gs(jax.lax.stop_gradient(img), grid,
                               align_corners=align_corners)
        else:
            def wrapped(img, grid, align_corners=False):
                return real_gs(img, jax.lax.stop_gradient(grid),
                               align_corners=align_corners)
        patch(mda, "grid_sample_nhwc", wrapped)
    elif variant == "nomatch":
        def fake_match(cost, gt_valid):
            g = cost.shape[-1]
            out = jnp.broadcast_to(
                jnp.arange(g, dtype=jnp.int32), gt_valid.shape
            )
            # keep a data dependency on the cost so it isn't DCE'd away
            return out + (cost.sum() * 0).astype(jnp.int32)
        patch(mh, "hungarian_match_batched", fake_match)

    cfg = Config.fromfile("configs/rsprompter/rsprompter_query-nwpu.py")
    model = build_detector(cfg.model)
    b = demo_batch(batch_size=BS, image_size=(IMG, IMG), max_gt=8, num_classes=10)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1),
                           method="loss")
    )()
    freeze, override = freeze_paths_for(cfg.model)
    tx, _ = build_optimizer(
        variables["params"], base_lr=1e-4, total_steps=1000,
        freeze_paths=freeze, train_paths_override=override,
    )
    state = TrainState.create(variables["params"], variables.get("batch_stats"), tx)
    raw_step = make_train_step(model, tx, donate=False).__wrapped__
    rng = jax.random.PRNGKey(2)

    def make(n):
        def prog(state, batch, rng):
            def body(s, _):
                s2, m = raw_step(s, batch, rng)
                return s2, m["loss"]
            s, losses = jax.lax.scan(body, state, None, length=n)
            return s, losses.mean()
        return jax.jit(prog, donate_argnums=(0,))

    n_lo, n_hi = 2, 6
    lo, hi = make(n_lo), make(n_hi)
    for _ in range(2):
        state, l = lo(state, batch, rng)
        float(np.asarray(l))
        state, l = hi(state, batch, rng)
        float(np.asarray(l))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, l = lo(state, batch, rng)
        float(np.asarray(l))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, l = hi(state, batch, rng)
        float(np.asarray(l))
        t_hi = time.perf_counter() - t0
        dts.append((t_hi - t_lo) / (n_hi - n_lo))
    print(f"{variant:10s} {min(dts) * 1e3:8.1f} ms/step", flush=True)

    for (obj, name), fn in orig.items():
        setattr(obj, name, fn)


if __name__ == "__main__":
    for v in sys.argv[1:] or [
        "full", "noencoder", "nopixdec", "nodecoder", "nolosses", "nomatch",
    ]:
        run(v)
