"""tools/serve.py integration: batched HTTP serving on the CPU backend."""

import json
import os
import socket
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NWPU_IMG = "/root/reference/data/NWPU/imgs/003.jpg"

pytestmark = pytest.mark.skipif(
    not os.path.exists(NWPU_IMG), reason="NWPU data not available"
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_request_timeout_returns_503():
    """A request whose batch never completes must get a 503, not hang."""
    from http.server import ThreadingHTTPServer

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import serve as serve_mod

    class StuckWorker:
        batches_run = 0
        images_run = 0

        def submit(self, job):
            pass  # never sets job.event

    port = _free_port()
    handler = serve_mod.make_handler(
        StuckWorker(), "m", 0.3, request_timeout=0.2
    )
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps({"path": NWPU_IMG}).encode(),
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 503
    finally:
        srv.shutdown()


def test_batch_worker_groups_by_bucket():
    """Mixed-size jobs in one drained batch must run as one predict per size
    bucket (small images never pay big-bucket compute, and each sub-batch
    collates at a single input size)."""
    import numpy as np

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import serve as serve_mod

    calls = []

    class FakeInferencer:
        def _bucket_for(self, h, w):
            return (256, 256) if max(h, w) <= 256 else (512, 512)

        def __call__(self, imgs, **kw):
            calls.append(sorted(im.shape[0] for im in imgs))
            return {"predictions": [
                {"bboxes": [], "scores": [], "labels": []} for _ in imgs
            ]}

    w = serve_mod.BatchWorker(FakeInferencer(), 8, 0.01)
    jobs = [
        serve_mod._Job(np.zeros((s, s, 3), np.float32), 0.3, False)
        for s in (200, 400, 220)
    ]
    w._run_batch(jobs)
    assert sorted(calls) == [[200, 220], [400]]
    assert all(j.event.is_set() and j.result is not None for j in jobs)
    assert w.images_run == 3 and w.batches_run == 2


def test_bucketed_dispatcher_concurrent_per_bucket():
    """Each size bucket gets its OWN worker thread + batching window, so a
    small-bucket job never waits out the big bucket's window."""
    import numpy as np

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import serve as serve_mod

    class FakeInferencer:
        def _bucket_for(self, h, w):
            return (256, 256) if max(h, w) <= 256 else (512, 512)

        def __call__(self, imgs, **kw):
            return {"predictions": [
                {"bboxes": [], "scores": [], "labels": []} for _ in imgs
            ]}

    d = serve_mod.BucketedDispatcher(FakeInferencer(), 8, 0.05)
    jobs = [
        serve_mod._Job(np.zeros((s, s, 3), np.float32), 0.3, False)
        for s in (200, 400, 220)
    ]
    for j in jobs:
        d.submit(j)
    for j in jobs:
        assert j.event.wait(timeout=30)
        assert j.result is not None and j.error is None
    assert set(d._workers) == {(256, 256), (512, 512)}
    assert all(w.is_alive() for w in d._workers.values())
    assert d.images_run == 3
    assert d.batches_run == 2  # one per bucket (200+220 coalesced)


def test_smoke_predict_rejects_malformed_output():
    """A server whose model produces garbage must die BEFORE binding."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import serve as serve_mod

    class BrokenInferencer:
        def __call__(self, imgs, **kw):
            return {"predictions": [{"oops": 1}]}

    with pytest.raises(SystemExit):
        serve_mod.smoke_predict(BrokenInferencer(), 64)


@pytest.mark.slow
def test_serve_batches_concurrent_requests(tmp_path):
    port = _free_port()
    argv = [
        "tools/serve.py", "configs/rsprompter/smoke-nwpu-256.py",
        "--port", str(port), "--max-batch", "4", "--batch-window-ms", "3000",
    ]
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sys\n"
        f"sys.argv = {argv!r}\n"
        f"sys.path.insert(0, {REPO!r})\n"
        f"exec(compile(open({argv[0]!r}).read(), {argv[0]!r}, 'exec'),\n"
        f"     {{'__name__': '__main__', '__file__': {argv[0]!r}}})\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        # startup now includes the pre-bind smoke predict, which pays the
        # (max_batch, bucket) program compile the first request used to pay
        deadline = time.time() + 600
        saw_smoke = False
        for line in proc.stdout:
            if "smoke predict" in line:
                saw_smoke = True
            if "serving on" in line:
                break
            if time.time() > deadline:
                raise TimeoutError("server did not start")
        assert saw_smoke, "smoke predict must run before the port binds"
        assert proc.poll() is None

        results = []

        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict?score_thr=0.0",
                data=json.dumps({"path": NWPU_IMG}).encode(),
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                results.append(json.loads(r.read()))

        threads = [threading.Thread(target=post) for _ in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert len(results) == 3
        for res in results:
            assert {"bboxes", "scores", "labels", "masks_rle"} <= set(res)

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["images"] == 3
        # the 3-second window coalesced the concurrent posts
        assert health["batches"] < 3
    finally:
        proc.kill()
        proc.wait()
