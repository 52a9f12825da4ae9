from recommendation_models_tpu.ops.gram import gram_rhs
from recommendation_models_tpu.ops.solve import solve_spd, add_ridge
from recommendation_models_tpu.ops.topk import topk_scores, sharded_topk

__all__ = ["gram_rhs", "solve_spd", "add_ridge", "topk_scores", "sharded_topk"]
