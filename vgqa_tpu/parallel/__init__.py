from .mesh import build_mesh, batch_sharding, param_shardings  # noqa: F401
