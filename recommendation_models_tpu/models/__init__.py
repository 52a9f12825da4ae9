from recommendation_models_tpu.models.als import ALS
from recommendation_models_tpu.models.imc import IMC

__all__ = ["ALS", "IMC"]
