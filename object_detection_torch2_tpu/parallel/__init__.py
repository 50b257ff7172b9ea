from object_detection_torch2_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    init_distributed,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
