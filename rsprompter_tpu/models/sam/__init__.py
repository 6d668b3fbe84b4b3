from rsprompter_tpu.models.sam.common import MLPBlock, SamFeedForward, SamLayerNorm  # noqa: F401
from rsprompter_tpu.models.sam.configs import (  # noqa: F401
    SamMaskDecoderConfig,
    SamPromptEncoderConfig,
    SamVisionConfig,
    sam_config,
)
from rsprompter_tpu.models.sam.positional import (  # noqa: F401
    SamPositionalEmbedding,
    image_wide_positional_embeddings,
)
from rsprompter_tpu.models.sam.vision_encoder import SamVisionEncoder  # noqa: F401
from rsprompter_tpu.models.sam.prompt_encoder import SamMaskEmbedding, SamPromptEncoder  # noqa: F401
from rsprompter_tpu.models.sam.mask_decoder import SamMaskDecoder, SamTwoWayTransformer  # noqa: F401
from rsprompter_tpu.models.sam.sam import SamModel  # noqa: F401
