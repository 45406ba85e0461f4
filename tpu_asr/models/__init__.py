from tpu_asr.models.config import ModelConfig
from tpu_asr.models.encoder import Encoder
from tpu_asr.models.decoder import Decoder
from tpu_asr.models.transformer import Transformer, add_sos_eos
from tpu_asr.models.cif import CifModel
from tpu_asr.models.lm import LMConfig, TransformerLM

__all__ = ["ModelConfig", "Encoder", "Decoder", "Transformer", "CifModel",
           "add_sos_eos", "LMConfig", "TransformerLM"]
