from rsprompter_tpu.engine.checkpoint import (  # noqa: F401
    latest_checkpoint,
    load_sam_pretrained,
    restore_checkpoint,
    save_checkpoint,
)
from rsprompter_tpu.engine.optim import build_optimizer, build_param_label_fn  # noqa: F401
from rsprompter_tpu.engine.runner import Runner  # noqa: F401
from rsprompter_tpu.engine.train_state import (  # noqa: F401
    TrainState,
    make_sharded_predict,
    make_sharded_train_step,
    make_train_step,
)
