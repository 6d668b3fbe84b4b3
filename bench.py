"""Benchmark: SAM ViT-B image-encoder throughput @1024^2 (images/sec/chip).

The headline metric of BASELINE.json ("images/sec/chip (SAM ViT-B @1024^2)").
The reference publishes no throughput baseline; the north-star target is
>= 2x an A100's throughput per chip.

A100 reference point (40 img/s): the SAM paper reports its ViT-H image
encoder at ~0.15 s/image on an A100 (arXiv 2304.02643, §Zero-Shot Text-to-
Mask / model card "runs in a web browser ... image embedding 0.15s on A100"),
i.e. 6.7 img/s; ViT-B has ~8x fewer encoder FLOPs (0.74 vs 5.9 TFLOPs per
1024^2 image counted from the arch table), giving ~53 img/s as a FLOP-scaled
ceiling; public batched fp16 measurements for ViT-B land at 30-50 img/s.
We take 40 img/s, so ``vs_baseline`` = value / 80.

Timing follows docs/design.md "Timing methodology": NONZERO random inputs
(all-zero chains can collapse to nonsense), in-graph scan chaining with a
non-foldable data dependency, slope between two chain lengths.

Prints one JSON line per metric: {"metric", "value", "unit", "vs_baseline"}.
The FIRST line is the headline encoder metric; subsequent lines are
full-model numbers (anchor predict, anchor train step) for the driver log.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


A100_REFERENCE_IPS = 40.0
TARGET_MULTIPLIER = 2.0

# Wall-clock budget for the OPTIONAL full-model extras (seconds from process
# start). A fully cold run is ~12 large XLA programs through the tunnel
# (2-6 min compile each); the driver runs bench.py under its own timeout, and
# the round-5 rc=124 showed the extras can eat the headline. Phases check the
# deadline BEFORE starting; whatever completed still prints, and the headline
# (measured first, printed last) always survives.
_T0 = time.time()
BENCH_DEADLINE_SECS = float(os.environ.get("RSPROMPTER_BENCH_DEADLINE", 2100))


def _past_deadline(label):
    if time.time() - _T0 > BENCH_DEADLINE_SECS:
        import sys

        print(
            f"{label} skipped: past RSPROMPTER_BENCH_DEADLINE "
            f"({BENCH_DEADLINE_SECS:.0f}s)", file=sys.stderr, flush=True,
        )
        return True
    return False


def _enable_compile_cache():
    """Persistent XLA compile cache under .xla_cache/ (same as the dryrun):
    re-runs with unchanged code recompile nothing, so the driver's bench
    invocation is warm if the builder ran bench.py in the same round."""
    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".xla_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # the cache is an optimization; never fail the bench over it


def bench_full_model():
    """Full-model metrics @1024^2 bs2 for BOTH families, printed as extra
    JSON lines BEFORE the headline: predict device-compute (scan-chained) and
    host-observed e2e (flat single-buffer transfer, pipelined — transfer
    overlapped with the next batch's compute), plus the CANONICAL train-step
    s/iter.

    Train steps are the REAL training configuration (VERDICT r3 weak #2):
    ``engine.optim.build_optimizer`` with the config's freeze masks (frozen
    SAM encoder/decoder get set_to_zero, not AdamW updates), timed by
    in-graph ``lax.scan`` chaining of the raw step — the same discipline as
    the encoder headline; the slope between two chain lengths cancels the
    per-call tunnel dispatch/transfer constants that inflated the round-3
    numbers ~1.9x.
    """
    import numpy as np

    from rsprompter_tpu.apis.build import build_detector, freeze_paths_for
    from rsprompter_tpu.core.config import Config
    from rsprompter_tpu.engine.optim import build_optimizer
    from rsprompter_tpu.engine.train_state import TrainState, make_train_step
    from rsprompter_tpu.utils.testing import demo_batch

    bs = 2
    cfg = Config.fromfile(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "configs/rsprompter/rsprompter_anchor-nwpu.py",
    ))
    model = build_detector(cfg.model)
    b = demo_batch(batch_size=bs, image_size=(1024, 1024), max_gt=8, num_classes=10)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda: model.init(rng, batch, jax.random.PRNGKey(1), method="loss")
    )()

    def attempt(label, fn, tries=2):
        import sys

        if _past_deadline(label):
            return None
        t0 = time.time()
        for i in range(tries):
            try:
                out = fn()
                print(f"{label}: {time.time() - t0:.0f}s",
                      file=sys.stderr, flush=True)
                return out
            except Exception as e:  # transient tunnel/backend errors: retry
                if i == tries - 1:
                    print(f"{label} skipped: {e}", flush=True)
                import gc

                gc.collect()

    def chained_predict_time(model_, vars_):
        """Device-compute s/batch of predict by the scan-slope method (the
        same discipline as the train steps: each iteration's input depends on
        the previous output, so the chain is serialized on device and the
        slope cancels dispatch/transfer constants)."""
        def make(n):
            @jax.jit
            def prog(variables, b):
                def body(img, _):
                    dets, probs = model_.apply(
                        variables, dict(b, images=img), method="predict"
                    )
                    eps = probs.mean() * 1e-9 + dets.scores.mean() * 1e-9
                    return img * (1.0 + eps.astype(img.dtype)), ()

                img, _ = jax.lax.scan(body, b["images"], None, length=n)
                return img.mean()

            return prog

        n_lo, n_hi = 1, 4
        lo, hi = make(n_lo), make(n_hi)
        for _ in range(3):
            float(np.asarray(lo(vars_, batch)))
            float(np.asarray(hi(vars_, batch)))
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(lo(vars_, batch)))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(np.asarray(hi(vars_, batch)))
            t_hi = time.perf_counter() - t0
            dts.append((t_hi - t_lo) / (n_hi - n_lo))
        return min(dts)

    def piped_predict_time(model_, vars_, warmup=6, reps=12, depth=2):
        """Host-observed e2e s/batch with the serving 'flat' transfer path
        (``tools/serve.py --mask-transfer flat``): masks thresholded and
        bit-packed on device (PARITY-documented boundary-band deviation)
        then packed WITH the det fields into ONE uint8 buffer — one transfer
        round-trip per batch instead of five — and PIPELINED with a
        ``depth``-deep in-flight queue so device compute overlaps the tunnel
        transfer. A/B'd in scripts/perf_e2e_depth.py (tree-of-5 depth1
        133 ms -> flat depth2 124 ms @1024^2 bs2 anchor); this is the
        steady-state throughput a batched consumer actually sees."""
        from rsprompter_tpu.ops.masks import pack_mask_bits, pack_predict_flat

        @jax.jit
        def predict(variables, b):
            dets, probs = model_.apply(variables, b, method="predict")
            return pack_predict_flat(dets, pack_mask_bits(probs))

        def fetch(out):
            np.asarray(out)

        for _ in range(warmup):
            fetch(predict(vars_, batch))
        t0 = time.perf_counter()
        inflight = []
        for _ in range(reps):
            out = predict(vars_, batch)  # async dispatch
            out.copy_to_host_async()
            inflight.append(out)
            if len(inflight) > depth:
                fetch(inflight.pop(0))
        for out in inflight:
            fetch(out)
        return (time.perf_counter() - t0) / reps

    def bench_predict_family(name, model_, vars_):
        dt = chained_predict_time(model_, vars_)
        print(json.dumps({
            "metric": f"{name} predict device (scan-chained, ViT-B @1024^2, bs2, tpu)",
            "value": round(bs / dt, 2), "unit": "img/s",
            "vs_baseline": None,
        }))
        dt = piped_predict_time(model_, vars_)
        print(json.dumps({
            "metric": f"{name} predict e2e (flat transfer, pipelined, ViT-B @1024^2, bs2, tpu)",
            "value": round(bs / dt, 2), "unit": "img/s",
            "vs_baseline": None,
        }))

    def chained_step_time(model_, model_cfg, vars_):
        """s/iter of the full train step (fwd+bwd+optim, real freeze masks)
        by the scan-slope method: each scan iteration's forward depends on
        the previous iteration's param update, so the chain is strictly
        serialized on device with no host round-trips inside."""
        freeze, override = freeze_paths_for(model_cfg)
        tx, _ = build_optimizer(
            vars_["params"], base_lr=1e-4, total_steps=1000,
            freeze_paths=freeze, train_paths_override=override,
        )
        state = TrainState.create(vars_["params"], vars_.get("batch_stats"), tx)
        raw_step = make_train_step(model_, tx, donate=False).__wrapped__

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
        for _ in range(2):  # compile + per-program warmup (threading state)
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
        return min(dts)

    def bench_train():
        dt = chained_step_time(model, cfg.model, variables)
        print(json.dumps({
            "metric": "anchor train step (ViT-B @1024^2, bs2, frozen-SAM optimizer, tpu)",
            "value": round(dt, 3), "unit": "s/iter",
            "vs_baseline": None,
        }))

    def bench_query_train(qmodel, qcfg, qvars):
        dt = chained_step_time(qmodel, qcfg.model, qvars)
        print(json.dumps({
            "metric": "query train step (ViT-B @1024^2, bs2, frozen-SAM optimizer, tpu)",
            "value": round(dt, 3), "unit": "s/iter",
            "vs_baseline": None,
        }))

    def build_query():
        qcfg = Config.fromfile(os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "configs/rsprompter/rsprompter_query-nwpu.py",
        ))
        qmodel = build_detector(qcfg.model)
        qvars = jax.jit(
            lambda: qmodel.init(rng, batch, jax.random.PRNGKey(1), method="loss")
        )()
        return qmodel, qcfg, qvars

    attempt("anchor predict bench",
            lambda: bench_predict_family("anchor", model, variables))
    attempt("anchor train bench", bench_train)
    q = attempt("query build", build_query)
    if q is not None:
        qmodel, qcfg, qvars = q
        # predict BEFORE train: chained_step_time donates its TrainState,
        # whose params alias qvars - predict afterwards would read deleted
        # buffers ("Array has been deleted")
        attempt("query predict bench",
                lambda: bench_predict_family("query", qmodel, qvars))
        attempt("query train bench", lambda: bench_query_train(qmodel, qcfg, qvars))


def measure_headline(batch=8, image_size=1024):
    """-> (img/s, platform) for the encoder headline (scan-slope method)."""
    from rsprompter_tpu.models.sam.configs import sam_config
    from rsprompter_tpu.models.sam.vision_encoder import SamVisionEncoder
    cfg = sam_config("base", image_size=image_size).vision_config
    platform = jax.devices()[0].platform
    # fused Pallas path (packed-qkv attention + fused MLP) on TPU
    attn_impl = "xla" if platform == "cpu" else "fused"
    model = SamVisionEncoder(config=cfg, attn_impl=attn_impl, dtype=jnp.bfloat16)

    # NONZERO inputs (docs/design.md timing rule): normal noise at image scale.
    x = jax.random.normal(
        jax.random.PRNGKey(42), (batch, image_size, image_size, 3), jnp.bfloat16
    )
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, output_hidden_states=False)
    )()

    @jax.jit
    def forward(params, x):
        return model.apply(params, x, output_hidden_states=False)

    # In-graph chained timing: a lax.scan of N forwards where each iteration
    # consumes a scalar derived from the previous output (non-foldable data
    # dependency -> strictly serialized on device), returning one scalar.
    # Slope between two N values cancels dispatch/transfer constants — the
    # axon tunnel's async dispatch makes per-call host timing unreliable.
    import numpy as np

    def make(n):
        @jax.jit
        def prog(params, x):
            def body(xx, _):
                out = forward(params, xx)
                return xx * (1.0 + (out.mean() * 1e-9).astype(xx.dtype)), ()

            xx, _ = jax.lax.scan(body, x, None, length=n)
            return xx.mean()

        return prog

    n_lo, n_hi = 4, 14
    lo, hi = make(n_lo), make(n_hi)
    for _ in range(3):  # compile + per-program warmup
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
    return batch / min(dts), platform


def main():
    batch, image_size = 8, 1024
    _enable_compile_cache()
    # transient tunnel errors (remote_compile read-body etc.) happen; the
    # driver runs this exactly once per round, so retry the headline once
    for attempt in range(2):
        try:
            ips, platform = measure_headline(batch, image_size)
            break
        except Exception as e:
            if attempt:
                raise
            import gc
            import sys

            print(f"headline attempt 1 failed ({e}); retrying",
                  file=sys.stderr, flush=True)
            gc.collect()

    if os.environ.get("RSPROMPTER_BENCH_FULL", "1") != "0":
        try:
            bench_full_model()
        except Exception as e:  # full-model extras must never kill the headline
            print(f"full-model bench skipped: {e}", flush=True)

    baseline = A100_REFERENCE_IPS * TARGET_MULTIPLIER
    print(
        json.dumps(
            {
                "metric": f"images/sec/chip (SAM ViT-B @{image_size}^2, bs{batch}, bf16, {platform})",
                "value": round(ips, 2),
                "unit": "img/s",
                "vs_baseline": round(ips / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
