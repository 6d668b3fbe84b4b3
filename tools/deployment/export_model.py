"""Export the jitted predict function as a serialized StableHLO artifact.

The TPU-native analogue of the reference's ``tools/deployment/``
(mmdet2torchserve / torch2onnx): ``jax.export`` lowers the full predict —
preprocessing-normalized batch in, padded detections + uint8 mask probs
out — into a self-contained artifact that a serving process can
``deserialize`` and ``call`` without any model code or config.

Two modes:
  --embed-weights (default)  weights baked in as constants: one file serves
  --no-embed-weights         program only; the caller supplies the params
                             pytree at call time (small artifact, e.g. for
                             versioning programs separately from weights)

Usage:
  python tools/deployment/export_model.py CONFIG [CKPT] --out model.jaxexp \
      [--batch-size 1] [--no-embed-weights] [--check]

Load side:
  import jax.export
  exp = jax.export.deserialize(open("model.jaxexp", "rb").read())
  out = exp.call(batch)            # embedded mode
  out = exp.call(variables, batch) # program-only mode
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def parse_args():
    p = argparse.ArgumentParser(description="export predict as StableHLO")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--image-size", type=int, default=None,
                   help="square input size (default: config crop)")
    p.add_argument("--no-embed-weights", dest="embed", action="store_false")
    p.add_argument("--check", action="store_true",
                   help="deserialize and compare against direct predict")
    return p.parse_args()


def _flat_predict(model):
    """predict -> a plain dict of arrays (standard pytree: no custom nodes
    to register for serialization). Mask probs ship uint8 (4x smaller)."""
    from rsprompter_tpu.ops.masks import quantize_probs_u8

    def fn(variables, batch):
        dets, probs = model.apply(variables, batch, method="predict")
        return {
            "boxes": dets.boxes, "scores": dets.scores,
            "labels": dets.labels, "valid": dets.valid,
            "mask_probs_u8": quantize_probs_u8(probs),
        }

    return fn


def build_exported(cfg, weights=None, batch_size=1, image_size=None,
                   embed_weights=True):
    """-> (jax.export.Exported, example_batch, variables)."""
    import jax

    from rsprompter_tpu.apis.build import build_detector
    from rsprompter_tpu.apis.inferencer import make_infer_batch

    model = build_detector(cfg.model)
    size = image_size or tuple(cfg.get("crop_size", (1024, 1024)))[0]
    # the example batch comes from the SAME builder DetInferencer.__call__
    # uses, so the artifact's input pytree matches serving batches
    # key-for-key by construction
    b, _ = make_infer_batch(
        [np.zeros((size, size, 3), np.float32)] * batch_size,
        (size, size), batch_size,
    )
    batch = {k: jax.numpy.asarray(v) for k, v in b.items()}
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, batch,
                           method="predict")
    )()

    sam_ckpt = cfg.model.get("hf_sam_pretrain_ckpt_path") or cfg.model.get(
        "sam_checkpoint"
    )
    if sam_ckpt and os.path.exists(sam_ckpt):
        from rsprompter_tpu.engine.checkpoint import load_sam_pretrained
        from rsprompter_tpu.utils.torch_convert import load_torch_checkpoint

        sd = load_torch_checkpoint(sam_ckpt)
        params, _ = load_sam_pretrained(variables["params"], sd,
                                        cfg.model["type"])
        variables = {**variables, "params": params}
    if weights:
        from rsprompter_tpu.engine.checkpoint import restore_train_params

        params, bstats = restore_train_params(weights)
        variables = {**variables, "params": params}
        if bstats is not None:
            variables["batch_stats"] = bstats

    fn = _flat_predict(model)
    if embed_weights:
        exp = jax.export.export(jax.jit(lambda bt: fn(variables, bt)))(batch)
    else:
        exp = jax.export.export(jax.jit(fn))(variables, batch)
    return exp, batch, variables


def main():
    args = parse_args()
    import jax

    from rsprompter_tpu.core.config import Config

    cfg = Config.fromfile(args.config)
    exp, batch, variables = build_exported(
        cfg, weights=args.checkpoint, batch_size=args.batch_size,
        image_size=args.image_size, embed_weights=args.embed,
    )
    blob = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported predict -> {args.out} "
          f"({len(blob) / 1e6:.1f} MB, platforms={exp.platforms}, "
          f"weights {'embedded' if args.embed else 'external'})")
    if args.check:
        exp2 = jax.export.deserialize(bytearray(blob))
        out = exp2.call(batch) if args.embed else exp2.call(variables, batch)
        from rsprompter_tpu.apis.build import build_detector

        model = build_detector(cfg.model)
        ref = jax.jit(_flat_predict(model))(variables, batch)
        diffs = {
            k: float(np.max(np.abs(
                np.asarray(out[k], np.float32) - np.asarray(ref[k], np.float32)
            )))
            for k in ref
        }
        print("roundtrip max|diff|:", diffs)
        # compilation of the deserialized StableHLO may fuse differently
        # than the in-process jit: allow fp-accumulation-order noise
        tol = {"boxes": 1e-2, "scores": 1e-4, "labels": 0.0, "valid": 0.0,
               "mask_probs_u8": 1.0}
        bad = {k: v for k, v in diffs.items() if v > tol[k]}
        assert not bad, bad
        print("roundtrip check OK (within fp-reassociation tolerance)")


if __name__ == "__main__":
    main()
