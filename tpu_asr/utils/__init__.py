from tpu_asr.utils.vocab import Vocab, BLANK, SOS, EOS, UNK
from tpu_asr.utils.cer import edit_distance, cer
from tpu_asr.utils.padding import pad_list, make_pad_mask

IGNORE_ID = -1

__all__ = [
    "Vocab", "BLANK", "SOS", "EOS", "UNK", "edit_distance", "cer",
    "pad_list", "make_pad_mask", "IGNORE_ID",
]
