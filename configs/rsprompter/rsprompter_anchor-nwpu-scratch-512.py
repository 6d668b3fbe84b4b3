# RSPrompter-anchor on NWPU, FROM-SCRATCH training evidence run @512^2.
#
# The reference always starts from pretrained SAM weights
# (hf_sam_pretrain_ckpt_path); this environment has no network egress and no
# SAM checkpoint on disk (and SSDD/WHU ship annotations but not images), so
# the strongest available learning evidence is end-to-end training on full
# NWPU (520 train / 130 val images) with everything trainable
# (train_backbone=True unfreezes the encoder; decoder_freeze=False trains
# the SAM mask decoder). Exercises the exact train -> checkpoint -> eval
# chain pretrained weights would use.
_base_ = ["./rsprompter_anchor-nwpu.py"]

crop_size = (512, 512)
model = dict(
    image_size=512,
    bf16=True,
    train_backbone=True,
    decoder_freeze=False,
    train_cfg=dict(
        rpn=dict(num=256, pos_fraction=0.5),
        rpn_proposal=dict(nms_pre=2000, max_per_img=512, pre_nms_total=4096),
    ),
    test_cfg=dict(
        rpn=dict(nms_pre=1000, max_per_img=512, pre_nms_total=4096),
        rcnn=dict(score_thr=0.05, nms_iou_thr=0.5, max_per_img=100, nms_pre=2000,
                  mask_thr_binary=0.5),
    ),
)

train_dataloader = dict(batch_size=4)
val_dataloader = dict(batch_size=4)

base_lr = 2.0e-4
grad_clip = 1.0
weight_decay = 0.05
warmup_iters = 200
max_epochs = 60
val_interval = 10
ckpt_interval = 10
log_interval = 20
