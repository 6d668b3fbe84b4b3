# SAM-det on NWPU (reference: configs/rsprompter/samdet_fasterrcnn-nwpu.py)
_base_ = ["./rsprompter_anchor-nwpu.py"]

model = dict(
    _delete_=True,
    type="SAMDet",
    hf_sam_pretrain_name="facebook/sam-vit-base",
    hf_sam_pretrain_ckpt_path="pretrain/sam-vit-base/pytorch_model.bin",
    num_classes=10,
    resnet_depth=50,
    image_size=1024,
    train_cfg=dict(
        rpn=dict(num=256, pos_fraction=0.5),
        rpn_proposal=dict(nms_pre=2000, max_per_img=1000, pre_nms_total=2000),
    ),
    test_cfg=dict(
        rpn=dict(nms_pre=1000, max_per_img=1000, pre_nms_total=2000),
        rcnn=dict(score_thr=0.05, nms_iou_thr=0.5, max_per_img=100, nms_pre=2000,
                  mask_thr_binary=0.5),
        oracle_on=False,
    ),
)
max_epochs = 200
