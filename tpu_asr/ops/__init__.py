from tpu_asr.ops.losses import label_smoothing_loss, token_accuracy
from tpu_asr.ops.ctc import ctc_loss, ctc_greedy_collapse
from tpu_asr.ops.cif import cif_weights, cif_fire, scale_alphas, quantity_loss

__all__ = [
    "label_smoothing_loss", "token_accuracy", "ctc_loss",
    "ctc_greedy_collapse", "cif_weights", "cif_fire", "scale_alphas",
    "quantity_loss",
]
