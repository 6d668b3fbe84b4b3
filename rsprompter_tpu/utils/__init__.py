from rsprompter_tpu.utils.torch_convert import (  # noqa: F401
    load_torch_checkpoint,
    torch_to_flax,
)
