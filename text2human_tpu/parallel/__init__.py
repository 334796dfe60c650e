from text2human_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    shard_params,
    transformer_param_specs,
)
