"""DetInferencer: size-bucket routing + draw utility."""

import numpy as np

from rsprompter_tpu.apis.inferencer import DetInferencer, draw_predictions


def _inf(buckets=None):
    return DetInferencer(
        {"type": "RSPrompterAnchor", "arch": "base", "num_classes": 1,
         "image_size": 1024},
        size_buckets=buckets,
    )


def test_bucket_routing():
    inf = _inf([512, 1024])
    assert inf._bucket_for(300, 400) == (512, 512)
    assert inf._bucket_for(512, 100) == (512, 512)
    assert inf._bucket_for(600, 600) == (1024, 1024)
    assert inf._bucket_for(2000, 100) == (1024, 1024)  # clamps to largest
    # no buckets -> config crop size
    inf2 = _inf(None)
    assert inf2._bucket_for(300, 400) == (1024, 1024)


def test_draw_predictions_runs():
    img = np.zeros((64, 64, 3), np.float32)
    pred = dict(
        bboxes=[[4, 4, 30, 30]], scores=[0.9], labels=[0],
        masks=np.zeros((1, 64, 64), bool),
    )
    pred["masks"][0, 5:20, 5:20] = True
    out = draw_predictions(img, pred)
    assert out.shape == (64, 64, 3)
    assert out.max() > 0  # something was drawn
