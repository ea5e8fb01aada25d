from fewbit_tpu.models.mlp import MLP  # noqa: F401
from fewbit_tpu.models.roberta import (  # noqa: F401
    RobertaConfig, RobertaForSequenceClassification, RobertaModel)
