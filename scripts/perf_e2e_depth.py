"""A/B the e2e predict transfer strategy @1024^2 bs2 (anchor family).

The piped e2e predict (bench.py) dispatches rep i+1 before fetching rep i;
this probes whether a deeper in-flight queue or fewer/larger transfer
buffers move the host-observed throughput (tunnel RTT vs bandwidth bound).

Usage: python scripts/perf_e2e_depth.py [depths...]   (default 1 2 3)
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
from rsprompter_tpu.ops.masks import pack_mask_bits
from rsprompter_tpu.utils.testing import demo_batch

BS = 2
IMG = 1024


def main():
    depths = [int(v) for v in sys.argv[1:]] or [1, 2, 3]
    cfg = Config.fromfile("configs/rsprompter/rsprompter_anchor-nwpu.py")
    model = build_detector(cfg.model)
    batch = {
        k: jnp.asarray(v)
        for k, v in demo_batch(BS, (IMG, IMG), max_gt=8, num_classes=10).items()
    }
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1),
                           method="loss")
    )()

    @jax.jit
    def predict(variables, b):
        dets, probs = model.apply(variables, b, method="predict")
        return dets, pack_mask_bits(probs)

    @jax.jit
    def predict_flat(variables, b):
        """Everything in ONE uint8 buffer: bits + f32 det fields bit-cast."""
        dets, probs = model.apply(variables, b, method="predict")
        bits = pack_mask_bits(probs)
        small = jnp.concatenate([
            dets.boxes.reshape(BS, -1),
            dets.scores.reshape(BS, -1),
            dets.labels.astype(jnp.float32).reshape(BS, -1),
            dets.valid.astype(jnp.float32).reshape(BS, -1),
        ], axis=-1)
        return jnp.concatenate(
            [jax.lax.bitcast_convert_type(small, jnp.uint8).reshape(BS, -1),
             bits.reshape(BS, -1)], axis=-1)

    def fetch(out):
        leaves = jax.tree_util.tree_leaves(out)
        for leaf in leaves:
            leaf.copy_to_host_async()
        for leaf in leaves:
            np.asarray(leaf)

    for name, fn in [("tree", predict), ("flat", predict_flat)]:
        for _ in range(6):
            fetch(fn(variables, batch))
        for depth in depths:
            reps = 12
            t0 = time.perf_counter()
            inflight = []
            for _ in range(reps):
                inflight.append(fn(variables, batch))
                if len(inflight) > depth:
                    fetch(inflight.pop(0))
            for out in inflight:
                fetch(out)
            dt = (time.perf_counter() - t0) / reps
            print(f"{name} depth={depth}: {dt * 1e3:7.1f} ms/batch "
                  f"= {BS / dt:5.2f} img/s", flush=True)


if __name__ == "__main__":
    main()
