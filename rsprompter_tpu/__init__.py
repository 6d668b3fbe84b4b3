"""rsprompter_tpu: a TPU-native (JAX/XLA/Pallas/pjit) instance-segmentation framework.

Re-implements the capabilities of KyanChen/RSPrompter (reference: /root/reference)
as an idiomatic JAX framework: flax modules, Pallas kernels for the hot ops,
pjit/shard_map data+tensor parallelism, orbax checkpointing, and a thin
config-compatible API surface.
"""

__version__ = "0.1.0"

from rsprompter_tpu.core.registry import (  # noqa: F401
    DATASETS,
    MODELS,
    METRICS,
    TRANSFORMS,
    TASK_UTILS,
    Registry,
)
