"""Configuration system (yacs-compatible surface, dependency-free).

Module-level ``cfg`` mirrors /root/reference/vgqa/config/__init__.py:4.
"""

from .node import CfgNode
from .defaults import build_default_cfg

cfg = build_default_cfg()

__all__ = ["cfg", "CfgNode", "build_default_cfg"]
