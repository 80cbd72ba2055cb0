from torch_tts_tpu.parallel.mesh import (
    batch_sharding,
    init_multihost,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
