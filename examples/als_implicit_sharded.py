"""Implicit feedback + sharding + checkpointing.

- `alpha=40` switches to the Hu-Koren-Volinsky confidence-weighted
  objective (ratings treated as interaction counts).
- `n_shards` row-shards the factor tables over a device mesh; on a
  multi-chip TPU slice this is the production path. To demo on CPU:
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python examples/als_implicit_sharded.py
- Checkpoints are async orbax saves; `resume()` restores the latest.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import jax
import scipy.sparse as sp

from recommendation_models_tpu import ALS
from recommendation_models_tpu.data.synthetic import synthetic_ratings

n_users, n_items = 6_040, 3_706  # ML-1M shape
users, items, ratings = synthetic_ratings(n_users, n_items, 1_000_000, rank=16, seed=0)
R = sp.csr_matrix((ratings, (users, items)), shape=(n_users, n_items))

n_shards = min(8, jax.device_count())
ckpt = tempfile.mkdtemp(prefix="als_ckpt_")

model = ALS(rank=64, reg=0.1, alpha=40.0, n_sweeps=8,
            n_shards=n_shards, exchange="allgather",
            checkpoint_dir=ckpt, checkpoint_every=2, verbose=1)
model.fit(R)
print(f"fitted on {n_shards} shard(s); factors U{model.U_.shape} V{model.V_.shape}")

# restart-resume: a fresh estimator picks up the latest checkpoint
restored = ALS(rank=64, alpha=40.0, checkpoint_dir=ckpt)
sweep = restored.resume()
print(f"resumed at sweep {sweep}; top-5 for user 0: {restored.top_n(0, 5)}")
