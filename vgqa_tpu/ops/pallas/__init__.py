from .flash_attention import flash_attention, flash_mha  # noqa: F401
