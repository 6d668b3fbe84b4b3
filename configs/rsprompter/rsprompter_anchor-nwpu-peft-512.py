# RSPrompter-anchor @512 with LoRA finetuning of the encoder
# (reference: configs/rsprompter/rsprompter_anchor-nwpu-peft-512.py:
#  MMPretrainSamVisionEncoder img_size=512 + PseudoFeatureAggregator + peft)
_base_ = ["./rsprompter_anchor-nwpu.py"]

crop_size = (512, 512)
model = dict(
    bf16=True,  # reference trains AMP fp16 (AmpOptimWrapper)
    image_size=512,
    aggregator_type="pseudo",
    peft_config=dict(r=16, lora_alpha=32, target_modules=["qkv"]),
)
