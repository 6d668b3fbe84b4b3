from rsprompter_tpu.evaluation.coco_eval import CocoEvaluator  # noqa: F401
from rsprompter_tpu.evaluation.coco_metric import CocoMetric, gt_from_raw_sample  # noqa: F401
from rsprompter_tpu.evaluation.rle import RLE, decode_mask, encode_masks, iou_matrix  # noqa: F401
