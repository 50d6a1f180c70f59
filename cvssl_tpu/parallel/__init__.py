"""Device mesh / sharding utilities."""
from cvssl_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated, shard_batch, replicate_state)
