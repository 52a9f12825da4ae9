from recommendation_models_tpu.parallel.mesh import get_mesh, initialize_distributed
from recommendation_models_tpu.parallel.exchange import ExchangePlan, build_exchange_plan
from recommendation_models_tpu.parallel.sharded_als import ShardedALSProgram

__all__ = [
    "get_mesh",
    "initialize_distributed",
    "ExchangePlan",
    "build_exchange_plan",
    "ShardedALSProgram",
]
