from recommendation_models_tpu.data.layout import (
    Bucket,
    PaddedLayout,
    ShardedLayout,
    build_layout,
    layout_from_coo,
    shard_layout,
)
from recommendation_models_tpu.data.synthetic import synthetic_ratings
from recommendation_models_tpu.data import movielens

__all__ = [
    "Bucket",
    "PaddedLayout",
    "ShardedLayout",
    "build_layout",
    "layout_from_coo",
    "shard_layout",
    "synthetic_ratings",
    "movielens",
]
