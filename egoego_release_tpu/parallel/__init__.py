from egoego_release_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    batch_sharding,
    replicated,
)
