from . import attention, position_encoding  # noqa: F401
