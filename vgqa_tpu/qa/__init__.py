from .engine import ByteTokenizer, GenerationConfig, QAEngine  # noqa: F401
from .llm import LLM, LLMConfig, TokenEmbedding, init_kv_cache  # noqa: F401
from .vit import ViTConfig, VisionTower  # noqa: F401
