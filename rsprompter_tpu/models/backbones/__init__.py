from rsprompter_tpu.models.backbones.resnet import ResNet  # noqa: F401
