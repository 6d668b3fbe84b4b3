# Self-parity regression config (VERDICT r4 #10): a tiny-but-complete
# RSPrompter-anchor through the REAL NWPU data pipeline, deterministic
# (train_aug=False, fixed seed), cheap enough to re-run on CPU every round.
# The committed golden trajectory (tests/golden/regress_nwpu_128.json) pins
# the end-to-end numerics of the 26-component train->eval chain; see
# tests/test_regression_net.py.
_base_ = ["./rsprompter_anchor-nwpu.py"]

crop_size = (128, 128)
max_gt = 30
max_epochs = 4
val_interval = 4
base_lr = 0.001
train_aug = False
log_interval = 1

model = dict(
    bf16=False,  # CPU-deterministic fp32
    image_size=128,
    # tiny ViT: the vision_config escape hatch overrides the named arch
    vision_config=dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        image_size=128, patch_size=8, window_size=4,
        global_attn_indexes=(1,), output_channels=32,
    ),
    select_layers=(1, 2),
    aggregator_hidden=8,
    rpn_strides=(2, 4, 8, 16, 32),
    roi_strides=(2, 4, 8, 16),
    prompt_shape=(10, 3),
    num_samples=16,
    # everything trains (random init end to end): livelier trajectory, and
    # drift anywhere in the gradient chain moves the goldens
    train_backbone=True,
    decoder_freeze=False,
    train_cfg=dict(
        rpn=dict(num=16, pos_fraction=0.5),
        rpn_proposal=dict(nms_pre=50, max_per_img=20, pre_nms_total=60),
    ),
    test_cfg=dict(
        rpn=dict(nms_pre=50, max_per_img=20, pre_nms_total=60),
        rcnn=dict(score_thr=0.05, nms_iou_thr=0.5, max_per_img=10,
                  mask_thr_binary=0.5),
    ),
)

train_dataloader = dict(batch_size=2, dataset=dict(indices=4))
val_dataloader = dict(batch_size=2, dataset=dict(indices=2))
test_dataloader = val_dataloader
dist = dict(enable=False)
