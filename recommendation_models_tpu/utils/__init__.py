from recommendation_models_tpu.utils.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    load_latest,
)
from recommendation_models_tpu.utils.logging import MetricsLogger
from recommendation_models_tpu.utils.profiling import trace_sweeps

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "load_latest",
    "MetricsLogger",
    "trace_sweeps",
]
