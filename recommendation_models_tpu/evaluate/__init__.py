from recommendation_models_tpu.evaluate.metrics import (
    rmse,
    recall_at_k,
    ndcg_at_k,
    take_groups,
)
from recommendation_models_tpu.evaluate.protocol import (
    grouped_by_user,
    leave_n_out,
    relevant_by_user,
)

__all__ = ["rmse", "recall_at_k", "ndcg_at_k", "take_groups",
           "grouped_by_user", "leave_n_out", "relevant_by_user"]
