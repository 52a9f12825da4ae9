"""recommendation_models_tpu — a TPU-native matrix-factorization retrieval engine.

A from-scratch JAX/XLA framework with the capabilities of
GrierPhillips/Recommendation-Models' scikit-learn-style ``ALS`` and ``IMC``
estimators (see SURVEY.md §2), re-designed TPU-first:

- CSR rating storage        -> degree-bucketed padded segment-gather layout
                               (:mod:`recommendation_models_tpu.data.layout`)
- SciPy lstsq/solve         -> batched Cholesky solves (stock XLA or Pallas
                               kernels, :mod:`recommendation_models_tpu.ops`)
- Python per-row loops      -> vmapped, jitted, shard_map-sharded sweeps
                               (:mod:`recommendation_models_tpu.solver`)
- single-host CPU pool      -> jax.sharding.Mesh over ICI/DCN with
                               all-gather / all-to-all embedding exchange
                               (:mod:`recommendation_models_tpu.parallel`)

Public API mirrors the reference's estimator surface (SURVEY.md §1 L5):
``ALS`` and ``IMC`` with fit / predict / score / get_params / set_params,
plus top-k recommendation serving.
"""

__version__ = "0.1.0"

from recommendation_models_tpu.models.als import ALS
from recommendation_models_tpu.models.imc import IMC

__all__ = ["ALS", "IMC", "__version__"]
