"""torch checkpoint -> flax params import.

SURVEY.md §7 hard part 5 calls for a weight-import path FROM the
reference's `.pth.tar` checkpoint format (src/transformer/transformer.py
`serialize`/`load_model`: a torch.save dict carrying hyperparams +
state_dict) so bit-level loss parity can be grounded against real
reference checkpoints. The reference mount is empty, so the tensor-name
map below targets the in-repo torch twin (tpu_asr.parity.torch_twin),
whose module naming mirrors the expected reference layout; when real
checkpoints appear, only `KEY_ALIASES` should need extending.

The mapping is the exact inverse of torch_twin.import_flax_params:
  conv kernels   torch [out, in, kh, kw]  -> flax [kh, kw, in, out]
  linear weights torch [out, in]          -> flax [in, out]
  q/k/v proj     torch [d, d]             -> flax [d, H, dh]
  out proj       torch [d, H*dh]          -> flax [H, dh, d]
  layernorm      weight/bias              -> scale/bias
"""

from __future__ import annotations

import numpy as np

from tpu_asr.models.config import ModelConfig

# state_dict key prefixes: reference-style name -> twin/flax-style name.
# Extend when importing checkpoints whose modules are named differently
# (e.g. "encoder.layer_stack.0." in the kaituoxu lineage).
KEY_ALIASES: dict[str, str] = {}


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t, dtype=np.float32)


def _apply_aliases(sd: dict) -> dict:
    if not KEY_ALIASES:
        return sd
    out = {}
    for k, v in sd.items():
        for src, dst in KEY_ALIASES.items():
            if k.startswith(src):
                k = dst + k[len(src):]
                break
        out[k] = v
    return out


def torch_state_dict_to_flax(sd: dict, cfg: ModelConfig) -> dict:
    """Twin-format (reference-shaped) state_dict -> flax params pytree
    matching tpu_asr.models.Transformer ({'params': ...} NOT included)."""
    sd = _apply_aliases(sd)
    d, h = cfg.d_model, cfg.num_heads
    dh = d // h

    def conv(prefix):
        w = _np(sd[f"{prefix}.weight"])          # [out, in, kh, kw]
        return {"kernel": w.transpose(2, 3, 1, 0),
                "bias": _np(sd[f"{prefix}.bias"])}

    def linear(prefix):
        return {"kernel": _np(sd[f"{prefix}.weight"]).T,
                "bias": _np(sd[f"{prefix}.bias"])}

    def mha(prefix):
        out = {}
        for name in ("q_proj", "k_proj", "v_proj"):
            w = _np(sd[f"{prefix}.{name}.weight"])       # [d, d]
            out[name] = {"kernel": w.T.reshape(d, h, dh),
                         "bias": _np(sd[f"{prefix}.{name}.bias"])
                         .reshape(h, dh)}
        w = _np(sd[f"{prefix}.out_proj.weight"])          # [d, H*dh]
        out["out_proj"] = {"kernel": w.T.reshape(h, dh, d),
                           "bias": _np(sd[f"{prefix}.out_proj.bias"])}
        return out

    def ffn(prefix):
        return {"w_1": linear(f"{prefix}.w_1"), "w_2": linear(f"{prefix}.w_2")}

    def ln(prefix):
        return {"LayerNorm_0": {"scale": _np(sd[f"{prefix}.weight"]),
                                "bias": _np(sd[f"{prefix}.bias"])}}

    enc: dict = {}
    if cfg.input_layer == "conv2d":
        enc["subsample"] = {"conv1": conv("subsample.conv1"),
                            "conv2": conv("subsample.conv2"),
                            "out": linear("subsample.out")}
    for i in range(cfg.num_enc_layers):
        enc[f"layer_{i}"] = {
            "slf_attn": mha(f"enc_layers.{i}.slf_attn"),
            "ffn": ffn(f"enc_layers.{i}.ffn"),
            "post_attn": ln(f"enc_layers.{i}.norm_attn"),
            "post_ffn": ln(f"enc_layers.{i}.norm_ffn"),
        }

    params: dict = {"encoder": enc}
    if cfg.num_dec_layers > 0:
        dec: dict = {"embed": {"embedding": _np(sd["embed.weight"])}}
        for i in range(cfg.num_dec_layers):
            dec[f"layer_{i}"] = {
                "slf_attn": mha(f"dec_layers.{i}.slf_attn"),
                "crs_attn": mha(f"dec_layers.{i}.crs_attn"),
                "ffn": ffn(f"dec_layers.{i}.ffn"),
                "post_slf": ln(f"dec_layers.{i}.norm_slf"),
                "post_crs": ln(f"dec_layers.{i}.norm_crs"),
                "post_ffn": ln(f"dec_layers.{i}.norm_ffn"),
            }
        if not cfg.tie_embedding and "out_proj.weight" in sd:
            dec["out_proj"] = linear("out_proj")
        params["decoder"] = dec
    if cfg.model_type in ("ctc", "hybrid") and "ctc_proj.weight" in sd:
        params["ctc_head"] = {"ctc_proj": linear("ctc_proj")}
    return params


def load_torch_checkpoint(path: str, cfg: ModelConfig | None = None):
    """Load a reference-style `.pth.tar` (or bare state_dict) checkpoint.

    Returns ({'params': flax_tree}, cfg). Unwraps the common torch.save
    layouts: a bare state_dict, or a dict with 'state_dict'/'model' plus
    hyperparameters (reference Transformer.serialize stores args alongside
    weights — those are mapped onto ModelConfig when cfg is not given).
    """
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob
    if isinstance(blob, dict) and not any(
            hasattr(v, "shape") for v in blob.values()):
        for key in ("state_dict", "model", "model_state_dict"):
            if key in blob:
                sd = blob[key]
                break
    if cfg is None:
        hyp = blob if isinstance(blob, dict) else {}
        cfg = ModelConfig(
            vocab_size=int(hyp.get("vocab_size", ModelConfig.vocab_size)),
            d_model=int(hyp.get("d_model", ModelConfig.d_model)),
            d_inner=int(hyp.get("d_inner", ModelConfig.d_inner)),
            num_heads=int(hyp.get("n_head", hyp.get("num_heads",
                                                    ModelConfig.num_heads))),
            num_enc_layers=int(hyp.get("n_layers_enc",
                                       hyp.get("num_enc_layers",
                                               ModelConfig.num_enc_layers))),
            num_dec_layers=int(hyp.get("n_layers_dec",
                                       hyp.get("num_dec_layers",
                                               ModelConfig.num_dec_layers))),
        )
    return {"params": torch_state_dict_to_flax(dict(sd), cfg)}, cfg
