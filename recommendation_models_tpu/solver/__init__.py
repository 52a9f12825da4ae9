from recommendation_models_tpu.solver.als_sweep import (
    device_buckets,
    half_sweep,
    masked_sse,
    make_sweep_fns,
)

__all__ = ["device_buckets", "half_sweep", "masked_sse", "make_sweep_fns"]
