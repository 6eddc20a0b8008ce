from .mesh import (  # noqa: F401
    batch_sharding,
    build_mesh,
    param_shardings,
    sp_batch_shardings,
)
from .distributed import initialize_multihost, put_global_batch  # noqa: F401
