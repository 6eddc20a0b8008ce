from .mesh import build_mesh, batch_sharding, param_shardings  # noqa: F401
from .distributed import initialize_multihost, put_global_batch  # noqa: F401
