from text2human_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    shard_params,
    transformer_param_specs,
)
from text2human_tpu.parallel.pp import (
    make_pp_train_step,
    pipeline_denoise,
    pp_param_specs,
    shard_pp_params,
)
