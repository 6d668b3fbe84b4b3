from rsprompter_tpu.core.config import Config  # noqa: F401
from rsprompter_tpu.core.registry import (  # noqa: F401
    DATASETS,
    MODELS,
    METRICS,
    TRANSFORMS,
    TASK_UTILS,
    Registry,
)
from rsprompter_tpu.core.structures import DetDataSample, InstanceData  # noqa: F401
