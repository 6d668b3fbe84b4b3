from rsprompter_tpu.parallel.distributed import initialize, process_info  # noqa: F401
from rsprompter_tpu.parallel.mesh import (  # noqa: F401
    DEFAULT_TP_RULES,
    batch_shardings,
    make_mesh,
    param_shardings,
    zero_shardings,
)
