from tgq.parallel.mesh import (
    make_mesh,
    param_sharding_rules,
    shard_params,
    batch_sharding,
    replicated,
    dp_hessian_gram,
)
