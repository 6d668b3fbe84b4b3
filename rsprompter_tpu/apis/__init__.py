from rsprompter_tpu.apis.build import build_detector, freeze_paths_for  # noqa: F401
from rsprompter_tpu.apis.inferencer import DetInferencer, draw_predictions  # noqa: F401
from rsprompter_tpu.apis.inference import inference_detector, init_detector  # noqa: F401
