# SAM-seg (Mask2Former) on SSDD (reference: configs/rsprompter/samseg-mask2former-ssdd.py)
_base_ = ["./rsprompter_anchor-ssdd.py"]

num_queries = 30

model = dict(
    bf16=True,  # reference trains AMP fp16 (AmpOptimWrapper)
    _delete_=True,
    type="SAMSegMask2Former",
    hf_sam_pretrain_name="facebook/sam-vit-base",
    hf_sam_pretrain_ckpt_path="pretrain/sam-vit-base/pytorch_model.bin",
    num_classes=1,
    prompt_shape=(num_queries, 5),  # num queries
    peft_config=None,
    image_size=1024,
    train_cfg=dict(num_points=12544, oversample_ratio=3.0,
                   importance_sample_ratio=0.75),
    test_cfg=dict(max_per_image=num_queries),
)
max_epochs = 200
