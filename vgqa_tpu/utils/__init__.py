from . import boxes  # noqa: F401
from .containers import VideoBatch, TextBatch  # noqa: F401
