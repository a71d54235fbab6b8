from sinddm_tpu.parallel.distributed import (  # noqa: F401
    initialize as initialize_distributed,
    is_primary,
    stage_batch,
    stage_replicated,
)
from sinddm_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated_sharding,
)
