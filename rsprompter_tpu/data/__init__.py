from rsprompter_tpu.data.coco import (  # noqa: F401
    CocoDataset,
    NWPUInsSegDataset,
    SSDDInsSegDataset,
    WHUInsSegDataset,
)
from rsprompter_tpu.data.loader import DataLoader  # noqa: F401
from rsprompter_tpu.data.transforms import (  # noqa: F401
    build_test_pipeline,
    build_train_pipeline,
    collate_batch,
)
