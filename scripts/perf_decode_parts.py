"""In-context ablation of the SAM mask-decoder at predict shapes.

100-prompt shared-dense decode measured 77.6 ms (scripts/time_decode.py)
against a ~3 ms FLOP roofline — find where it goes by patching components
to near-no-ops:

  full        unmodified
  noblock2    SamTwoWayAttentionBlock.__call__ -> identity (loop layers; the
              first block runs via shared_first and is untouched)
  noshared1   shared_first -> cheap broadcast (isolates the first block)
  noattn      SamAttention.__call__ -> mean stub (ALL standard attention:
              layer-2 attns + final token->image; shared_first internals
              partially use dedicated paths)
  noupscale   ConvTranspose -> mean stub (the 2x upscaler deconvs)
  nohyper     SamFeedForward -> mean stub (hypernetworks + iou head)

Usage: python scripts/perf_decode_parts.py [variants...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from rsprompter_tpu.models.sam.configs import SamMaskDecoderConfig

B, P, S, HW = 1, 100, 64, 64


def _time(fn, *args, warmup=5, reps=10):
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
    import rsprompter_tpu.models.sam.common as common

    orig = {}

    def patch(obj, name, fn):
        orig[(obj, name)] = getattr(obj, name)
        setattr(obj, name, fn)

    if variant == "noblock2":
        patch(md.SamTwoWayAttentionBlock, "__call__",
              lambda self, q, k, qpe, kpe: (q + qpe.mean(), k + kpe.mean()))
    elif variant == "noshared1":
        def fake_shared(self, queries, keys, query_pe, key_pe):
            b, p, t, c = queries.shape
            keys_pp = jnp.broadcast_to(
                keys[:, None], (b, p) + keys.shape[1:]
            ) + queries.mean()
            return queries + key_pe.mean(), keys_pp
        patch(md.SamTwoWayAttentionBlock, "shared_first", fake_shared)
    elif variant == "noattn":
        def fake_attn(self, query, key, value):
            return (
                jnp.zeros(query.shape[:-1] + (self.config.hidden_size,),
                          query.dtype)
                + (key.mean() + value.mean()).astype(query.dtype)
            )
        patch(md.SamAttention, "__call__", fake_attn)
    elif variant == "noupscale":
        def fake_deconv(self, x):
            b, h, w, _ = x.shape
            return jnp.zeros(
                (b, 2 * h, 2 * w, self.features), x.dtype
            ) + x.mean()
        patch(fnn.ConvTranspose, "__call__", fake_deconv)
    elif variant == "nohyper":
        def fake_ff(self, x):
            return jnp.zeros(
                x.shape[:-1] + (self.output_dim,), x.dtype
            ) + x.mean()
        patch(common.SamFeedForward, "__call__", fake_ff)

    cfg = SamMaskDecoderConfig()
    model = md.SamMaskDecoder(config=cfg, dtype=jnp.bfloat16)
    r = jax.random.PRNGKey(0)
    img = jax.random.normal(r, (B, S, S, cfg.hidden_size), jnp.bfloat16)
    pe = jax.random.normal(r, (B, S, S, cfg.hidden_size), jnp.bfloat16)
    sparse = jax.random.normal(r, (B, P, 5, cfg.hidden_size), jnp.bfloat16)
    dense = jax.random.normal(r, (B, S, S, cfg.hidden_size), jnp.bfloat16)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), img, pe, sparse, dense)
    )()

    @jax.jit
    def step(params, img, pe, sparse, dense):
        m, i = model.apply(params, img, pe, sparse, dense)
        return m.mean() + i.mean()

    dt = _time(step, params, img, pe, sparse, dense)
    print(f"{variant:10s} {dt * 1e3:8.1f} ms", flush=True)

    for (obj, name), fn in orig.items():
        setattr(obj, name, fn)


if __name__ == "__main__":
    for v in sys.argv[1:] or [
        "full", "noblock2", "noshared1", "noattn", "noupscale", "nohyper",
    ]:
        run(v)
