from recommendation_models_tpu.oracle.als_numpy import OracleALS
from recommendation_models_tpu.oracle.imc_numpy import OracleIMC

__all__ = ["OracleALS", "OracleIMC"]
