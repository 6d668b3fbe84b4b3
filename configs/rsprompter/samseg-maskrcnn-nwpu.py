# SAM-seg (Mask R-CNN) on NWPU (reference: configs/rsprompter/samseg-maskrcnn-nwpu.py)
_base_ = ["./rsprompter_anchor-nwpu.py"]

model = dict(
    bf16=True,  # reference trains AMP fp16 (AmpOptimWrapper)
    _delete_=True,
    type="SAMSegMaskRCNN",
    hf_sam_pretrain_name="facebook/sam-vit-base",
    hf_sam_pretrain_ckpt_path="pretrain/sam-vit-base/pytorch_model.bin",
    num_classes=10,
    peft_config=None,
    image_size=1024,
    num_samples=512,
    pos_fraction=0.25,
    train_cfg=dict(
        rpn=dict(num=256, pos_fraction=0.5),
        rpn_proposal=dict(nms_pre=2000, max_per_img=1000, pre_nms_total=2000),
    ),
    test_cfg=dict(
        rpn=dict(nms_pre=1000, max_per_img=1000, pre_nms_total=2000),
        rcnn=dict(score_thr=0.05, nms_iou_thr=0.5, max_per_img=100, nms_pre=2000,
                  mask_thr_binary=0.5),
    ),
)
max_epochs = 200
