from rsprompter_tpu.models.task_modules.anchor_generator import AnchorGenerator  # noqa: F401
from rsprompter_tpu.models.task_modules.assigners import max_iou_assign  # noqa: F401
from rsprompter_tpu.models.task_modules.samplers import random_sample_padded  # noqa: F401
