from .engine import (ByteTokenizer, GenerationConfig,  # noqa: F401
                     QAEngine, YUVTiles)
from .llm import LLM, LLMConfig, TokenEmbedding, init_kv_cache  # noqa: F401
from .vit import ViTConfig, VisionTower  # noqa: F401
