"""In-context ablation of the headline encoder forward @1024^2 bs8 bf16.

Same discipline as the model ablations (monkeypatch a component to a cheap
passthrough, re-init, scan-slope-time the full jitted forward): splits the
~80 ms batch into patchify / window layers / global layers / neck to rank
the next fusion lever (ROADMAP: neck+patchify fusion).

Variants:
  full       unmodified (the bench.py headline program)
  nopatch    SamPatchEmbeddings -> broadcast slice (patchify conv cost)
  noneck     SamVisionNeck -> zeros+mean (1x1 conv + LN2d + 3x3 conv + LN2d)
  nowin      the 8 windowed layers -> identity
  noglobal   the 4 global layers -> identity

Usage: python scripts/perf_encoder_parts.py [variants...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BS = 8
IMG = 1024


def run(variant):
    import rsprompter_tpu.models.sam.vision_encoder as ve
    from rsprompter_tpu.models.sam.configs import sam_config

    orig = {}

    def patch(obj, name, fn):
        orig[(obj, name)] = getattr(obj, name)
        setattr(obj, name, fn)

    if variant == "nopatch":
        def fake_patch(self, pixel_values):
            b, h, w, _ = pixel_values.shape
            p = self.patch_size
            x = pixel_values[:, ::p, ::p, :1]  # (B, h/p, w/p, 1)
            return jnp.broadcast_to(
                x, (b, h // p, w // p, self.hidden_size)
            ).astype(pixel_values.dtype)
        patch(ve.SamPatchEmbeddings, "__call__", fake_patch)
    elif variant == "noneck":
        def fake_neck(self, x):
            b, h, w, _ = x.shape
            return (jnp.zeros((b, h, w, self.output_channels), x.dtype)
                    + x.mean().astype(x.dtype))
        patch(ve.SamVisionNeck, "__call__", fake_neck)
    elif variant in ("nowin", "noglobal"):
        real_layer = ve.SamVisionLayer.__call__

        def fake_layer(self, x):
            is_window = self.window_size > 0
            skip = is_window if variant == "nowin" else not is_window
            if skip:
                return x * (1.0 + x.mean() * 1e-9).astype(x.dtype)
            return real_layer(self, x)
        patch(ve.SamVisionLayer, "__call__", fake_layer)

    cfg = sam_config("base", image_size=IMG).vision_config
    model = ve.SamVisionEncoder(config=cfg, attn_impl="fused", dtype=jnp.bfloat16)
    x = jax.random.normal(
        jax.random.PRNGKey(42), (BS, IMG, IMG, 3), jnp.bfloat16
    )
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, output_hidden_states=False)
    )()

    def make(n):
        @jax.jit
        def prog(params, xx):
            def body(img, _):
                out = model.apply(params, img, output_hidden_states=False)
                return img * (1.0 + (out.mean() * 1e-9).astype(img.dtype)), ()
            img, _ = jax.lax.scan(body, xx, None, length=n)
            return img.mean()
        return prog

    n_lo, n_hi = 4, 14
    lo, hi = make(n_lo), make(n_hi)
    for _ in range(3):
        float(np.asarray(lo(params, x)))
        float(np.asarray(hi(params, x)))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(lo(params, x)))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(hi(params, x)))
        t_hi = time.perf_counter() - t0
        dts.append((t_hi - t_lo) / (n_hi - n_lo))
    dt = min(dts)
    print(f"{variant:9s} {dt * 1e3:7.1f} ms/batch  ({BS / dt:6.1f} img/s)",
          flush=True)

    for (obj, name), fn in orig.items():
        setattr(obj, name, fn)


if __name__ == "__main__":
    for v in sys.argv[1:] or ["full", "nopatch", "noneck", "nowin", "noglobal"]:
        run(v)
