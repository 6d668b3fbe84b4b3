"""End-to-end RSPrompter-query + SAM-seg Mask2Former + unit tests for the
query-stack pieces (Hungarian costs, fusion head, deformable attention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsprompter_tpu.models.detectors.rsprompter_query import (
    RSPrompterQuery,
    SAMSegMask2Former,
)
from rsprompter_tpu.models.sam.configs import SamVisionConfig
from rsprompter_tpu.models.seg_heads.fusion_head import instance_postprocess, mask2bbox
from rsprompter_tpu.models.task_modules.hungarian import (
    bce_cost,
    dice_cost,
    hungarian_match,
)
from rsprompter_tpu.utils.testing import demo_batch

TINY_VISION = SamVisionConfig(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    image_size=64, patch_size=8, window_size=4, global_attn_indexes=(1,),
    output_channels=32,
)


def test_hungarian_match_prefers_low_cost():
    cost = jnp.asarray(
        [[0.1, 5.0], [5.0, 0.2], [3.0, 3.0]], jnp.float32
    )  # 3 queries, 2 gts
    out = np.asarray(hungarian_match(cost, jnp.asarray([True, True])))
    assert list(out) == [0, 1]
    out2 = np.asarray(hungarian_match(cost, jnp.asarray([True, False])))
    assert out2[0] == 0 and out2[1] == -1


def test_pairwise_costs_match_direct():
    rs = np.random.RandomState(0)
    pred = jnp.asarray(rs.randn(4, 16).astype(np.float32))
    gt = jnp.asarray((rs.rand(3, 16) > 0.5).astype(np.float32))
    c = np.asarray(bce_cost(pred, gt))
    # direct per-pair computation
    p = np.asarray(pred)
    g = np.asarray(gt)
    for i in range(4):
        for j in range(3):
            ref = (
                np.maximum(p[i], 0) - p[i] * g[j] + np.log1p(np.exp(-np.abs(p[i])))
            ).mean()
            assert abs(c[i, j] - ref) < 1e-4
    d = np.asarray(dice_cost(pred, gt))
    assert d.shape == (4, 3)
    assert (d >= -0.01).all() and (d <= 1.01).all()


def test_mask2bbox():
    m = np.zeros((2, 8, 8), bool)
    m[0, 2:5, 3:7] = True
    boxes = np.asarray(mask2bbox(jnp.asarray(m)))
    np.testing.assert_allclose(boxes[0], [3, 2, 7, 5])
    np.testing.assert_allclose(boxes[1], [0, 0, 0, 0])


def test_instance_postprocess_topk():
    q, c = 5, 2
    cls = np.full((q, c + 1), -5.0, np.float32)
    cls[:, -1] = 5.0  # all background...
    cls[2, 0] = 8.0  # ...except query 2 -> class 0
    masks = np.full((q, 8, 8), -5.0, np.float32)
    masks[2, 1:4, 1:4] = 5.0
    dets, probs = instance_postprocess(
        jnp.asarray(cls), jnp.asarray(masks), num_classes=c, max_per_image=3
    )
    assert dets.boxes.shape == (3, 4)
    best = int(np.argmax(np.asarray(dets.scores)))
    assert int(dets.labels[best]) == 0
    assert bool(dets.valid[best])
    np.testing.assert_allclose(np.asarray(dets.boxes)[best], [1, 1, 4, 4])


@pytest.fixture(scope="module")
def query_model():
    model = RSPrompterQuery(
        vision_config=TINY_VISION, image_size=64, num_classes=1,
        prompt_shape=(8, 3), select_layers=(1, 2), aggregator_hidden=8,
        feat_channels=32, num_decoder_layers=2,
        train_cfg=dict(num_points=64, oversample_ratio=2.0,
                       importance_sample_ratio=0.75),
        test_cfg=dict(max_per_image=5),
    )
    batch = {k: jnp.asarray(v) for k, v in demo_batch(2, (64, 64)).items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1),
        method="loss",
    )
    return model, variables, batch


def test_query_loss_mode(query_model):
    model, variables, batch = query_model
    losses = model.apply(
        variables, batch, jax.random.PRNGKey(2), method="loss",
        mutable=["batch_stats"],
    )[0]
    # 3 head evaluations (1 + 2 layers): last unprefixed + d0./d1.
    assert {"loss_cls", "loss_mask", "loss_dice", "loss_mask_plus",
            "loss_dice_plus"} <= set(losses)
    assert "d0.loss_cls" in losses and "d1.loss_cls" in losses
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_query_gradients_flow(query_model):
    model, variables, batch = query_model

    def total(params):
        ls = model.apply(
            {**variables, "params": params}, batch, jax.random.PRNGKey(2),
            method="loss", mutable=["batch_stats"],
        )[0]
        return sum(v for k, v in ls.items() if "loss" in k)

    grads = jax.grad(total)(variables["params"])
    g = grads["panoptic_head"]["point_emb_4"]["kernel"]
    assert np.abs(np.asarray(g)).max() > 0
    g_cls = grads["panoptic_head"]["cls_embed_0"]["kernel"]
    assert np.abs(np.asarray(g_cls)).max() > 0


def test_query_predict_mode(query_model):
    model, variables, batch = query_model
    dets, mask_probs = model.apply(variables, batch, method="predict")
    b = batch["images"].shape[0]
    assert dets.boxes.shape == (b, 5, 4)
    assert mask_probs.shape[:2] == (b, 5)
    assert np.asarray(mask_probs).min() >= 0


def test_samseg_mask2former_loss_and_predict():
    model = SAMSegMask2Former(
        vision_config=TINY_VISION, image_size=64, num_classes=2,
        prompt_shape=(8, 3), select_layers=(1, 2), aggregator_hidden=8,
        feat_channels=32, num_decoder_layers=2,
        train_cfg=dict(num_points=64),
        test_cfg=dict(max_per_image=5),
    )
    batch = {k: jnp.asarray(v) for k, v in demo_batch(2, (64, 64), num_classes=2).items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1),
        method="loss",
    )
    losses = model.apply(
        variables, batch, jax.random.PRNGKey(2), method="loss",
        mutable=["batch_stats"],
    )[0]
    assert "loss_mask_plus" not in losses  # stock head: single mask stream
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)).all(), k
    dets, probs = model.apply(variables, batch, method="predict")
    assert dets.boxes.shape[1] == 5


def test_batch_decode_matches_per_layer(query_model):
    """Layer-batched SAM decode (ONE decoder call, layers stacked on the
    point_batch axis) must be numerically identical to the reference-shaped
    per-layer decode loop (reference models.py:367-378)."""
    model, variables, batch = query_model

    def run(batch_decode):
        def fwd(self, images):
            feats, image_embeddings, image_pe = self.extract_feat(images)
            _, mask_list, plus_list, _ = self.panoptic_head(
                feats, image_embeddings, image_pe, batch_decode=batch_decode
            )
            return mask_list

        return model.apply(variables, batch["images"], method=fwd)

    batched = run(True)
    looped = run(False)
    assert len(batched) == len(looped) == 3  # initial head + 2 layers
    for a, b in zip(batched, looped):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-4, rtol=1e-3,
        )


def test_match_then_decode_loss_is_exact(query_model):
    """loss() decodes ONLY the matched queries (match runs on the plus
    stream); must equal the decode-all-queries-then-gather formulation."""
    from rsprompter_tpu.models.task_modules.hungarian import (
        hungarian_match_batched,
    )

    model, variables, batch = query_model
    rng = jax.random.PRNGKey(2)

    fast = model.apply(
        variables, batch, rng, method="loss", mutable=["batch_stats"]
    )[0]

    def decode_all_loss(self, batch, rng):
        feats, image_embeddings, image_pe = self.extract_feat(
            batch["images"], train=True
        )
        head = self.panoptic_head
        gt_labels, gt_masks, gt_valid = (
            batch["gt_labels"], batch["gt_masks"], batch["gt_valid"]
        )
        cls_list, mask_list, plus_list, _ = head(
            feats, image_embeddings, image_pe, batch_decode=True
        )
        n_layers = len(cls_list)
        costs = [
            head._match_cost(
                jax.random.fold_in(rng, li), cls_list[li], plus_list[li],
                gt_labels, gt_masks, gt_valid,
            )
            for li in range(n_layers)
        ]
        matched_all = hungarian_match_batched(
            jnp.stack(costs),
            jnp.broadcast_to(gt_valid[None], (n_layers,) + gt_valid.shape),
        )
        losses = {}
        for li in range(n_layers):
            layer_losses = head._loss_single(
                jax.random.fold_in(rng, li), cls_list[li], mask_list[li],
                plus_list[li], gt_labels, gt_masks, gt_valid, matched_all[li],
            )
            prefix = "" if li == n_layers - 1 else f"d{li}."
            for k, v in layer_losses.items():
                losses[f"{prefix}{k}"] = v
        return losses

    slow = model.apply(
        variables, batch, rng, method=decode_all_loss, mutable=["batch_stats"]
    )[0]
    assert set(fast) == set(slow)
    for k in fast:
        np.testing.assert_allclose(
            np.asarray(fast[k], np.float32), np.asarray(slow[k], np.float32),
            atol=2e-4, rtol=2e-3, err_msg=k,
        )


def test_tensor_mode(query_model):
    """mode='tensor' (reference base.py:59-99 -> maskformer _forward): every
    decoder layer's raw cls/mask logits, no fusion-head postprocess."""
    model, variables, batch = query_model
    cls_list, mask_list = jax.jit(
        lambda v, b: model.apply(v, b, method="tensor")
    )(variables, batch)
    assert len(cls_list) == len(mask_list) == model.num_decoder_layers + 1
    q = model.prompt_shape[0]
    assert cls_list[-1].shape == (2, q, model.num_classes + 1)
    assert mask_list[-1].ndim == 4 and mask_list[-1].shape[:2] == (2, q)
    for leaf in jax.tree_util.tree_leaves((cls_list, mask_list)):
        assert bool(jnp.isfinite(leaf).all())
