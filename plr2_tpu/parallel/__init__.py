from plr2_tpu.parallel.mesh import (  # noqa: F401
    init_distributed,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from plr2_tpu.parallel.data_parallel import (  # noqa: F401
    make_train_step,
    make_inference_step,
)
from plr2_tpu.parallel.tensor_parallel import (  # noqa: F401
    tp_spec,
    tp_shardings,
    shard_variables,
    sharded_param_count,
)
from plr2_tpu.parallel.point_parallel import (  # noqa: F401
    sp_chamfer,
    make_sp_inference_step,
    make_sp_train_step,
)
from plr2_tpu.parallel.pipeline_parallel import (  # noqa: F401
    make_pp_refine,
    make_pp_estimate_step,
)
