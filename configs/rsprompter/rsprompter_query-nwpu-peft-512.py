# RSPrompter-query @512 with LoRA + PseudoFeatureAggregator
# (reference: configs/rsprompter/rsprompter_query-nwpu-peft-512.py:
#  MMPretrainSamVisionEncoder img_size=512 + peft + pseudo aggregator)
_base_ = ["./rsprompter_query-nwpu.py"]

crop_size = (512, 512)
model = dict(
    bf16=True,  # reference trains AMP fp16 (AmpOptimWrapper)
    image_size=512,
    aggregator_type="pseudo",
    peft_config=dict(r=16, lora_alpha=32, target_modules=["qkv"]),
)
