# RSPrompter-query on WHU (reference: configs/rsprompter/rsprompter_query-whu.py)
_base_ = ["./rsprompter_anchor-whu.py"]

num_classes = 1
prompt_shape = (100, 5)

model = dict(
    bf16=True,  # reference trains AMP fp16 (AmpOptimWrapper)
    _delete_=True,
    type="RSPrompterQuery",
    hf_sam_pretrain_name="facebook/sam-vit-base",
    hf_sam_pretrain_ckpt_path="pretrain/sam-vit-base/pytorch_model.bin",
    num_classes=num_classes,
    prompt_shape=prompt_shape,
    decoder_freeze=False,
    peft_config=None,
    image_size=1024,
    with_sincos=True,
    train_cfg=dict(num_points=12544, oversample_ratio=3.0,
                   importance_sample_ratio=0.75),
    test_cfg=dict(max_per_image=100),
)
