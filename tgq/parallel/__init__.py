from tgq.parallel.mesh import (
    make_mesh,
    param_sharding_rules,
    shard_params,
    batch_sharding,
    replicated,
    dp_hessian_gram,
    mark_tp_kinds,
    quantized_matmul_tp,
    serving_mesh,
    set_serving_mesh,
)
