from fewbit_tpu.models.gpt import (  # noqa: F401
    GPTConfig, GPTForCausalLM, GPTModel)
from fewbit_tpu.models.mlp import MLP  # noqa: F401
from fewbit_tpu.models.roberta import (  # noqa: F401
    RobertaConfig, RobertaForSequenceClassification, RobertaModel)
