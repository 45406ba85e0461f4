from tpu_asr.decode.greedy_ctc import ctc_greedy_decode
from tpu_asr.decode.beam import attention_beam_search
from tpu_asr.decode.ctc_prefix import CTCPrefixScorer
from tpu_asr.decode.cif_decode import cif_greedy_decode

__all__ = ["ctc_greedy_decode", "attention_beam_search", "CTCPrefixScorer",
           "cif_greedy_decode"]
