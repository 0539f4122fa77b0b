from yolojax.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    param_shardings,
    replicated,
    shard_batch,
)
