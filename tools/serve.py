"""Batched HTTP model server (the production-serving surface).

The reference ships a gradio demo (``projects/gradio_demo/launch.py``) that
runs one image per request; on TPU the single-image path wastes the MXU, so
this server adds **dynamic batching**: requests queue up, a single inference
thread drains up to ``--max-batch`` of them every ``--batch-window-ms``, and
one batched predict serves them all. Size buckets compile once at startup
(``--warmup``) so no request pays a compile.

API:
  GET  /healthz            -> {"status": "ok", "model": ...}
  POST /predict            -> body = raw image bytes (jpg/png) or a JSON
                              {"path": "/abs/img.jpg"}; response = JSON
                              {"bboxes": [[x1,y1,x2,y2]...], "scores": [...],
                               "labels": [...], "masks_rle": [coco-rle...]}
                              query args: ?score_thr=0.3&masks=0

Usage:
  python tools/serve.py CONFIG [CKPT] --port 8000 --max-batch 8 \
      --size-buckets 512,1024 --warmup
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="batched inference server")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--batch-window-ms", type=float, default=10.0)
    p.add_argument("--size-buckets", default=None,
                   help="comma list, e.g. 512,1024 (default: config crop)")
    p.add_argument("--warmup", action="store_true",
                   help="compile every size bucket before accepting requests")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--exported", default=None,
                   help="serve a tools/deployment/export_model.py artifact "
                        "instead of tracing/compiling the model (must match "
                        "--max-batch and the bucket size it was exported at)")
    p.add_argument("--mask-transfer", default="u8",
                   choices=("u8", "f32", "bits", "flat"),
                   help="device->host mask encoding: u8 (4x less traffic, "
                        "default), f32 (exact), bits (32x less; thresholds "
                        "at low res — low latency), flat (bits + det fields "
                        "packed into ONE buffer = one transfer round-trip "
                        "per batch — lowest latency)")
    p.add_argument("--request-timeout", type=float, default=0.0,
                   help="seconds a request may wait for its batch result "
                        "before the server answers 503 (default 0 = wait "
                        "forever; a first request can legitimately wait out "
                        "a multi-minute cold compile — pair a timeout with "
                        "--warmup so requests never pay compiles)")
    return p.parse_args()


class _Job:
    __slots__ = ("img", "score_thr", "masks", "event", "result", "error")

    def __init__(self, img, score_thr, masks):
        self.img = img
        self.score_thr = score_thr
        self.masks = masks
        self.event = threading.Event()
        self.result = None
        self.error = None


class BatchWorker(threading.Thread):
    """Single device-owning thread: drains the queue into batched predicts."""

    def __init__(self, inferencer, max_batch: int, window_s: float):
        super().__init__(daemon=True)
        self.inferencer = inferencer
        self.max_batch = max_batch
        self.window_s = window_s
        self.jobs: "queue.Queue[_Job]" = queue.Queue()
        self.batches_run = 0
        self.images_run = 0

    def submit(self, job: _Job) -> None:
        self.jobs.put(job)

    def run(self) -> None:
        while True:
            batch = [self.jobs.get()]
            deadline = time.monotonic() + self.window_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.jobs.get(timeout=remaining))
                except queue.Empty:
                    break
            self._run_batch(batch)

    def _run_batch(self, batch) -> None:
        # one predict per size bucket: small images never pay big-bucket
        # compute, and every sub-batch collates at a single input size
        groups: "dict[tuple, list[_Job]]" = {}
        for j in batch:
            h, w = j.img.shape[:2]
            groups.setdefault(self.inferencer._bucket_for(h, w), []).append(j)
        for jobs in groups.values():
            try:
                out = self.inferencer(
                    [j.img for j in jobs], return_masks=True, score_thr=0.0
                )["predictions"]
                self.batches_run += 1
                self.images_run += len(jobs)
                for j, pred in zip(jobs, out):
                    j.result = self._post(pred, j)
            except Exception as e:  # pragma: no cover - surfaced as HTTP 500
                for j in jobs:
                    j.error = f"{type(e).__name__}: {e}"
            finally:
                for j in jobs:
                    j.event.set()

    @staticmethod
    def _post(pred, job: _Job) -> dict:
        from rsprompter_tpu.evaluation.rle import encode_masks

        scores = np.asarray(pred["scores"], np.float32)
        keep = scores > job.score_thr
        out = {
            "bboxes": np.asarray(pred["bboxes"], np.float32)[keep].tolist(),
            "scores": scores[keep].tolist(),
            "labels": np.asarray(pred["labels"], np.int64)[keep].tolist(),
        }
        if job.masks and "masks" in pred:
            masks = np.asarray(pred["masks"])[keep]
            out["masks_rle"] = [r.to_coco() for r in encode_masks(masks)]
        return out


class BucketedDispatcher:
    """One BatchWorker (queue + batching window) PER size bucket.

    A burst of small images never waits behind the big bucket's batching
    window, and host-side pre/post-processing of different buckets overlaps;
    device predicts still serialize on the single device inside jax. Workers
    spawn lazily on the first job for their bucket.
    """

    def __init__(self, inferencer, max_batch: int, window_s: float):
        self.inferencer = inferencer
        self.max_batch = max_batch
        self.window_s = window_s
        self._workers: "dict[tuple, BatchWorker]" = {}
        self._lock = threading.Lock()

    def submit(self, job: _Job) -> None:
        h, w = job.img.shape[:2]
        bucket = self.inferencer._bucket_for(h, w)
        with self._lock:
            worker = self._workers.get(bucket)
            if worker is None:
                worker = BatchWorker(self.inferencer, self.max_batch, self.window_s)
                worker.start()
                self._workers[bucket] = worker
        worker.submit(job)

    @property
    def batches_run(self) -> int:
        return sum(w.batches_run for w in self._workers.values())

    @property
    def images_run(self) -> int:
        return sum(w.images_run for w in self._workers.values())


def smoke_predict(inferencer, size: int) -> None:
    """Run one real predict through the full pipeline BEFORE binding the
    port, so a server with unloadable/garbage weights or a broken compile
    fails at startup instead of 500ing its first client."""
    t0 = time.perf_counter()
    out = inferencer(
        [np.zeros((size, size, 3), np.uint8)], return_masks=True, score_thr=1.0
    )["predictions"]
    if not out or not {"bboxes", "scores", "labels"} <= set(out[0]):
        raise SystemExit(
            f"smoke predict returned malformed predictions: {out!r:.200}"
        )
    print(f"smoke predict {size}^2 ok ({time.perf_counter() - t0:.1f}s)",
          flush=True)


def make_handler(worker: BatchWorker, model_name: str, default_thr: float,
                 request_timeout: float = 0.0):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet access log
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._send(200, {
                    "status": "ok", "model": model_name,
                    "batches": worker.batches_run, "images": worker.images_run,
                })
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if urlparse(self.path).path != "/predict":
                self._send(404, {"error": "not found"})
                return
            q = parse_qs(urlparse(self.path).query)
            thr = float(q.get("score_thr", [default_thr])[0])
            want_masks = q.get("masks", ["1"])[0] not in ("0", "false")
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            try:
                img = self._decode(data)
            except Exception as e:
                self._send(400, {"error": f"bad image: {e}"})
                return
            job = _Job(img, thr, want_masks)
            worker.submit(job)
            done = job.event.wait(request_timeout or None)
            if not done:
                self._send(503, {
                    "error": f"timed out after {request_timeout:.0f}s "
                             "(device busy; retry later)"
                })
                return
            if job.error:
                self._send(500, {"error": job.error})
            else:
                self._send(200, job.result)

        @staticmethod
        def _decode(data: bytes) -> np.ndarray:
            if data[:1] == b"{":
                path = json.loads(data)["path"]
                import cv2

                img = cv2.imread(path)
                if img is None:
                    raise ValueError(f"unreadable path {path}")
                return img
            import cv2

            img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
            if img is None:
                raise ValueError("undecodable bytes")
            return img

    return Handler


def main():
    args = parse_args()
    from rsprompter_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from rsprompter_tpu.apis.inferencer import DetInferencer

    buckets = (
        [int(s) for s in args.size_buckets.split(",")]
        if args.size_buckets else None
    )
    if args.checkpoint and not os.path.exists(args.checkpoint):
        sys.exit(f"checkpoint not found: {args.checkpoint}")
    if args.exported and not os.path.exists(args.exported):
        sys.exit(f"exported artifact not found: {args.exported}")
    inferencer = DetInferencer(
        args.config, weights=args.checkpoint, batch_size=args.max_batch,
        size_buckets=buckets, mask_transfer=args.mask_transfer,
        exported=args.exported,
    )
    inferencer.verify_weights()  # fail on unreadable ckpts before binding
    worker = BucketedDispatcher(
        inferencer, args.max_batch, args.batch_window_ms / 1e3
    )
    if args.warmup:
        for size in buckets or [inferencer.crop_size[0]]:
            t0 = time.perf_counter()
            inferencer(
                [np.zeros((size, size, 3), np.uint8)] * args.max_batch,
                return_masks=True, score_thr=1.0,
            )
            print(f"warmup {size}^2 x{args.max_batch}: "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
    # load-then-smoke: one real predict through the full pipeline on the
    # smallest bucket before the port binds (cheap after --warmup — the
    # program is already compiled)
    smoke_predict(inferencer, min(buckets) if buckets else inferencer.crop_size[0])
    server = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(worker, os.path.basename(args.config), args.score_thr,
                     args.request_timeout),
    )
    print(f"serving on http://{args.host}:{args.port} "
          f"(max_batch={args.max_batch}, window={args.batch_window_ms}ms)",
          flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
