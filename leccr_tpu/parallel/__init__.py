from leccr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_spec,
    replicated_spec,
    param_partition_spec,
    shard_batch,
)
from leccr_tpu.parallel.ring import ring_infonce  # noqa: F401
