from recommendation_models_tpu.evaluate.metrics import (
    rmse,
    recall_at_k,
    ndcg_at_k,
)
from recommendation_models_tpu.evaluate.protocol import leave_n_out

__all__ = ["rmse", "recall_at_k", "ndcg_at_k", "leave_n_out"]
