# Tiny smoke config for CLI integration runs (256^2, 4 train / 2 val images)
_base_ = ["./rsprompter_anchor-nwpu.py"]

crop_size = (256, 256)
max_gt = 30
max_epochs = 1
val_interval = 1
base_lr = 0.0001

model = dict(
    bf16=False,  # CPU-friendly smoke runs (inherits bf16=True otherwise)
    image_size=256,
    prompt_shape=(20, 5),
    train_cfg=dict(
        rpn=dict(num=64, pos_fraction=0.5),
        rpn_proposal=dict(nms_pre=200, max_per_img=100, pre_nms_total=300),
    ),
    test_cfg=dict(
        rpn=dict(nms_pre=200, max_per_img=100, pre_nms_total=300),
        rcnn=dict(score_thr=0.05, nms_iou_thr=0.5, max_per_img=20,
                  mask_thr_binary=0.5),
    ),
    num_samples=32,
)

train_dataloader = dict(batch_size=2, dataset=dict(indices=4))
val_dataloader = dict(batch_size=2, dataset=dict(indices=2))
test_dataloader = val_dataloader
