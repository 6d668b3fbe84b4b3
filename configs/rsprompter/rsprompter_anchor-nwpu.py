# RSPrompter-anchor on NWPU VHR-10 (reference: configs/rsprompter/rsprompter_anchor-nwpu.py)
_base_ = ["./_base_/default_runtime.py"]

num_classes = 10
prompt_shape = (70, 5)

hf_sam_pretrain_name = "facebook/sam-vit-base"
hf_sam_pretrain_ckpt_path = "pretrain/sam-vit-base/pytorch_model.bin"

model = dict(
    bf16=True,  # reference trains AMP fp16 (AmpOptimWrapper)
    type="RSPrompterAnchor",
    hf_sam_pretrain_name=hf_sam_pretrain_name,
    hf_sam_pretrain_ckpt_path=hf_sam_pretrain_ckpt_path,
    num_classes=num_classes,
    prompt_shape=prompt_shape,
    decoder_freeze=True,
    peft_config=None,
    image_size=1024,
    with_sincos=True,
    train_cfg=dict(
        rpn=dict(num=256, pos_fraction=0.5),
        rpn_proposal=dict(nms_pre=2000, max_per_img=1000, pre_nms_total=8192),
    ),
    test_cfg=dict(
        rpn=dict(nms_pre=1000, max_per_img=1000, pre_nms_total=4096),
        rcnn=dict(score_thr=0.05, nms_iou_thr=0.5, max_per_img=100, nms_pre=2000,
                  mask_thr_binary=0.5),
    ),
)

data_root = "/root/reference/data/NWPU"
train_dataloader = dict(
    batch_size=2,
    dataset=dict(
        type="NWPUInsSegDataset",
        data_root=data_root,
        ann_file="annotations/NWPU_instances_train.json",
        data_prefix=dict(img="imgs"),
    ),
)
val_dataloader = dict(
    batch_size=2,
    dataset=dict(
        type="NWPUInsSegDataset",
        data_root=data_root,
        ann_file="annotations/NWPU_instances_val.json",
        data_prefix=dict(img="imgs"),
        test_mode=True,
    ),
)
test_dataloader = val_dataloader
