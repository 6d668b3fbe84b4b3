"""Data pipeline tests on the real shipped NWPU annotations/images."""

import os

import numpy as np
import pytest

from rsprompter_tpu.data.coco import NWPUInsSegDataset
from rsprompter_tpu.data.loader import DataLoader
from rsprompter_tpu.data.transforms import (
    FilterAnnotations,
    Pad,
    PackDetInputs,
    RandomCrop,
    RandomFlip,
    RandomResize,
    Resize,
    build_test_pipeline,
    build_train_pipeline,
    collate_batch,
)

NWPU_ROOT = "/root/reference/data/NWPU"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(NWPU_ROOT), reason="NWPU data not available"
)


@pytest.fixture(scope="module")
def dataset():
    return NWPUInsSegDataset(
        ann_file="annotations/NWPU_instances_val.json",
        data_root=NWPU_ROOT,
        data_prefix=dict(img="imgs"),
        pipeline=build_test_pipeline((256, 256)),
        test_mode=True,
        indices=4,
    )


def test_dataset_loads_and_rasterizes(dataset):
    assert len(dataset) == 4
    raw = dataset.load_raw(0)
    assert raw["img"].ndim == 3 and raw["img"].shape[2] == 3
    n = len(raw["gt_bboxes"])
    assert n > 0
    assert raw["gt_masks"].shape == (n,) + raw["img"].shape[:2]
    # every mask overlaps its bbox region
    for b, m in zip(raw["gt_bboxes"], raw["gt_masks"]):
        x1, y1, x2, y2 = b.astype(int)
        assert m[y1:y2, x1:x2].sum() > 0


def test_test_pipeline_shapes(dataset):
    s = dataset[0]
    assert s["img"].shape == (256, 256, 3)
    h, w = s["img_shape"]
    assert max(h, w) == 256  # keep-ratio resize fits the long side
    # device-normalize mode (default): raw uint8 bytes ship; after the
    # on-device normalize the valid region is roughly zero-centered
    assert s["img"].dtype == np.uint8
    from rsprompter_tpu.models.preprocess import preprocess_images
    import jax.numpy as jnp

    normed = np.asarray(preprocess_images(jnp.asarray(s["img"][None])))[0]
    assert abs(normed[:h, :w].mean()) < 3.0


def test_train_pipeline_and_collate(dataset):
    rng = np.random.RandomState(0)
    pipe = build_train_pipeline((128, 128), rng=rng)
    samples = []
    for i in range(2):
        s = dataset.load_raw(i)
        for t in pipe:
            s = t(s)
            assert s is not None
        samples.append(s)
    batch, metas = collate_batch(samples, max_gt=10, pad_shape=(128, 128))
    assert batch["images"].shape == (2, 128, 128, 3)
    assert batch["gt_bboxes"].shape == (2, 10, 4)
    # masks ship bit-packed; device unpack must invert np.packbits exactly
    assert batch["gt_masks_packed"].shape == (2, 10, 128, 16)
    from rsprompter_tpu.ops.masks import unpack_bits

    raw, _ = collate_batch(samples, max_gt=10, pad_shape=(128, 128),
                           pack_masks=False)
    unpacked = np.asarray(unpack_bits(batch["gt_masks_packed"], 128))
    assert (unpacked == raw["gt_masks"]).all()
    assert batch["gt_valid"].dtype == bool
    assert metas[0]["batch_input_shape"] == (128, 128)
    # valid boxes are inside the crop
    v = batch["gt_valid"]
    assert (batch["gt_bboxes"][v] >= 0).all()
    assert (batch["gt_bboxes"][v][:, 2:] <= 128).all()


def test_dataloader_iterates(dataset):
    loader = DataLoader(dataset, batch_size=2, shuffle=True, max_gt=20,
                        pad_shape=(256, 256))
    batches = list(loader)
    assert len(batches) == 2
    batch, metas = batches[0]
    assert batch["images"].shape[0] == 2
    assert len(metas) == 2


def test_flip_consistency():
    img = np.zeros((10, 20, 3), np.float32)
    img[:, :5] = 1.0
    sample = dict(
        img=img, img_shape=(10, 20), ori_shape=(10, 20), scale_factor=(1, 1),
        gt_bboxes=np.array([[0, 0, 5, 10]], np.float32),
        gt_labels=np.array([0]), gt_ignore_flags=np.array([False]),
        gt_masks=np.ones((1, 10, 20), np.uint8),
    )
    out = RandomFlip(prob=1.1)(dict(sample))
    np.testing.assert_allclose(out["gt_bboxes"], [[15, 0, 20, 10]])
    assert out["img"][0, -1, 0] == 1.0


def test_dataloader_prefetch_matches_sync(dataset):
    a = DataLoader(dataset, batch_size=2, shuffle=False, max_gt=20,
                   pad_shape=(256, 256))
    b = DataLoader(dataset, batch_size=2, shuffle=False, max_gt=20,
                   pad_shape=(256, 256), prefetch=2)
    for (ba, ma), (bb, mb) in zip(a, b):
        np.testing.assert_array_equal(ba["images"], bb["images"])
        assert [m["img_id"] for m in ma] == [m["img_id"] for m in mb]


def test_pad_value_is_bgr_ordered_imagenet_mean():
    """Parity-critical (SURVEY A.1): test-pipeline pad uses BGR-ordered means
    so that after BGR->RGB + normalize the padded region is ~zero."""
    from rsprompter_tpu.data.transforms import PAD_VALUE_BGR, Pad, PackDetInputs

    img = np.full((10, 10, 3), 128.0, np.float32)  # BGR content
    sample = dict(
        img=img, img_shape=(10, 10), ori_shape=(10, 10), scale_factor=(1, 1),
        gt_bboxes=np.zeros((0, 4), np.float32), gt_labels=np.zeros(0, np.int64),
        gt_ignore_flags=np.zeros(0, bool), gt_masks=np.zeros((0, 10, 10), np.uint8),
    )
    out = Pad((16, 16))(sample)
    np.testing.assert_allclose(out["img"][12, 12], PAD_VALUE_BGR)
    # BGR channel order: blue slot holds 0.406*255
    assert abs(PAD_VALUE_BGR[0] - 0.406 * 255) < 1e-6
    out_host = PackDetInputs(normalize="host")(dict(out))
    # after normalization the padded region is exactly the zero-mean point
    np.testing.assert_allclose(out_host["img"][12, 12], [0, 0, 0], atol=1e-5)
    # device mode (default): raw uint8 BGR bytes ship; the on-device
    # normalize maps the pad value to ~0 (quantization-limited)
    out_dev = PackDetInputs()(dict(out))
    assert out_dev["img"].dtype == np.uint8
    from rsprompter_tpu.models.preprocess import preprocess_images
    import jax.numpy as jnp

    normed = np.asarray(preprocess_images(jnp.asarray(out_dev["img"][None])))
    np.testing.assert_allclose(normed[0, 12, 12], [0, 0, 0], atol=0.02)


def test_device_normalize_matches_host_path():
    """uint8 ship + on-device normalize (reference DetDataPreprocessor
    :110-149) agrees with the legacy host fp32 path to quantization error."""
    from rsprompter_tpu.data.transforms import PackDetInputs
    from rsprompter_tpu.models.preprocess import preprocess_images
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (16, 16, 3)).astype(np.float32)  # BGR content
    sample = dict(img=img)
    host = PackDetInputs(normalize="host")(dict(sample))["img"]
    dev_u8 = PackDetInputs()(dict(sample))["img"]
    assert dev_u8.dtype == np.uint8
    dev = np.asarray(preprocess_images(jnp.asarray(dev_u8[None])))[0]
    # integral inputs: bit-identical up to fp32 rounding
    np.testing.assert_allclose(dev, host, atol=1e-5)
