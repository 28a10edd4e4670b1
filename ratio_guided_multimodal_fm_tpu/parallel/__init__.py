from ratio_guided_multimodal_fm_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
from ratio_guided_multimodal_fm_tpu.parallel.sharded_guidance import (
    make_distributed_guided_sampler,
    make_distributed_guided_sampler_p,
)
