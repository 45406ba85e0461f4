from tpu_asr.models.config import ModelConfig
from tpu_asr.models.encoder import Encoder
from tpu_asr.models.decoder import Decoder
from tpu_asr.models.transformer import Transformer, add_sos_eos
from tpu_asr.models.cif import CifModel
from tpu_asr.models.lm import LMConfig, TransformerLM
from tpu_asr.models.transducer import TransducerModel


def build_model(cfg: ModelConfig):
    """Model-type dispatch (reference: the model-type selector flag in
    src/bin/train.py): transformer/ctc/hybrid share the Transformer glue;
    cif and transducer have their own modules."""
    if cfg.model_type == "cif":
        return CifModel(cfg)
    if cfg.model_type == "transducer":
        return TransducerModel(cfg)
    return Transformer(cfg)


__all__ = ["ModelConfig", "Encoder", "Decoder", "Transformer", "CifModel",
           "TransducerModel", "build_model", "add_sos_eos", "LMConfig",
           "TransformerLM"]
