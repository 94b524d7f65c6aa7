from lass_tpu.models.clap.roberta import RobertaConfig, RobertaModel
from lass_tpu.models.clap.model import CLAPTextEncoder, MLPProjection

__all__ = ["RobertaConfig", "RobertaModel", "CLAPTextEncoder",
           "MLPProjection"]
