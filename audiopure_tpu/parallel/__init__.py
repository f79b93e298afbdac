from audiopure_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_params_tp,
)
from audiopure_tpu.parallel.dp_kernel import (  # noqa: F401
    dp_shard_apply,
    dp_shard_attack,
    dp_shard_eval,
    make_dp_train_step,
)
from audiopure_tpu.parallel.stats import (  # noqa: F401
    collective_stats,
    hlo_collective_stats,
    tune_tp_layout,
)
