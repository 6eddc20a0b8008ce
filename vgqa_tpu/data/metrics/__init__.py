from .evaluator import (  # noqa: F401
    VidSTGEvaluator,
    VidSTGiouEvaluator,
    build_evaluator,
    precision_recall,
)
