"""Micro-ablation of the query-family point-sampled loss components.

Context: perf_query_parts.py showed the loss block costs ~1.59 s of the
2.15 s step (nolosses 565 ms vs full 2152 ms) — NOT the SAM decodes
(~380 ms) or the pixel decoder (~160 ms). This times the individual
samplers at real shapes to find which gathers dominate:

  matchQ   per-(mask,point) gather: 100 masks @256^2, 12544 shared pts  x B2
  matchQs  shared-index take version (point_utils.sample_mask_points_shared)
  matchG   GT gather @1024^2: 8 masks, 12544 shared pts                 x B2
  matchGs  shared-index take version
  lossF    per-mask sampling fwd: 16 masks @256^2, 12544 per-mask pts
  lossFB   same, fwd+bwd (the scatter-add backward)
  gtF      GT sampling @1024^2: 16 masks, 12544 per-mask pts
  topk     uncertainty top_k 37632->9408 x 16
  cand     candidate sampling: 16 masks @256^2, 37632 per-mask pts

Each timed via the scan-slope method (docs/design.md) with random inputs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rsprompter_tpu.ops.point_utils import (
    sample_mask_points,
    sample_mask_points_matmul,
    sample_mask_points_shared,
)

P = 12544
B = 2
Q = 100
G = 8


def slope_time(make_prog, *args, n_lo=2, n_hi=8, reps=3):
    lo, hi = make_prog(n_lo), make_prog(n_hi)
    for _ in range(3):
        float(np.asarray(lo(*args)))
        float(np.asarray(hi(*args)))
    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(lo(*args)))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(hi(*args)))
        t_hi = time.perf_counter() - t0
        dts.append((t_hi - t_lo) / (n_hi - n_lo))
    return min(dts)


def chain(fn):
    """fn(x, pts) -> scalar; returns make_prog for scan-slope timing."""

    def make(n):
        @jax.jit
        def prog(x, pts):
            def body(carry, _):
                out = fn(x * carry, pts)
                return 1.0 + out * 1e-12, ()

            c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=n)
            return c

        return prog

    return make


def main():
    which = sys.argv[1:] or [
        "matchQ", "matchQs", "matchQm", "matchG", "matchGs", "lossF", "lossFm",
        "lossFB", "lossFBm", "gtF", "gtFm", "topk", "cand", "candm",
    ]
    r = jax.random.PRNGKey(0)
    cases = {}

    m256 = jax.random.normal(r, (B * Q, 256, 256))
    pts_shared = jax.random.uniform(r, (P, 2))
    cases["matchQ"] = (
        chain(lambda x, p: sample_mask_points(
            x, jnp.broadcast_to(p[None], (B * Q,) + p.shape)).mean()),
        m256, pts_shared,
    )
    cases["matchQs"] = (
        chain(lambda x, p: sample_mask_points_shared(x, p).mean()),
        m256, pts_shared,
    )
    g1024 = jax.random.normal(r, (B * G, 1024, 1024))
    cases["matchQm"] = (
        chain(lambda x, p: sample_mask_points_matmul(
            x, jnp.broadcast_to(p[None], (B * Q,) + p.shape)).mean()),
        m256, pts_shared,
    )
    cases["matchG"] = (
        chain(lambda x, p: sample_mask_points(
            x, jnp.broadcast_to(p[None], (B * G,) + p.shape)).mean()),
        g1024, pts_shared,
    )
    cases["matchGs"] = (
        chain(lambda x, p: sample_mask_points_shared(x, p).mean()),
        g1024, pts_shared,
    )
    m16 = jax.random.normal(r, (B * G, 256, 256))
    pts_per = jax.random.uniform(r, (B * G, P, 2))
    cases["lossF"] = (
        chain(lambda x, p: sample_mask_points(x, p).mean()), m16, pts_per,
    )
    cases["lossFB"] = (
        chain(lambda x, p: jax.grad(
            lambda xx: sample_mask_points(xx, p).mean())(x).sum()),
        m16, pts_per,
    )
    cases["lossFm"] = (
        chain(lambda x, p: sample_mask_points_matmul(x, p).mean()), m16, pts_per,
    )
    cases["lossFBm"] = (
        chain(lambda x, p: jax.grad(
            lambda xx: sample_mask_points_matmul(xx, p).mean())(x).sum()),
        m16, pts_per,
    )
    cases["gtF"] = (
        chain(lambda x, p: sample_mask_points(x, p).mean()), g1024,
        jax.random.uniform(r, (B * G, P, 2)),
    )
    cases["gtFm"] = (
        chain(lambda x, p: sample_mask_points_matmul(x, p).mean()), g1024,
        jax.random.uniform(r, (B * G, P, 2)),
    )
    unc = jax.random.normal(r, (B * G, 37632))
    cases["topk"] = (
        chain(lambda x, p: jax.lax.top_k(x, 9408)[0].mean()), unc, pts_shared,
    )
    cases["cand"] = (
        chain(lambda x, p: sample_mask_points(x, p).mean()), m16,
        jax.random.uniform(r, (B * G, 37632, 2)),
    )
    cases["candm"] = (
        chain(lambda x, p: sample_mask_points_matmul(x, p).mean()), m16,
        jax.random.uniform(r, (B * G, 37632, 2)),
    )

    for name in which:
        make, x, p = cases[name]
        dt = slope_time(make, x, p)
        print(f"{name:10s} {dt * 1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
