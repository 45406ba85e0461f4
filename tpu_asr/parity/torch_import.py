"""torch checkpoint -> flax params import.

SURVEY.md §7 hard part 5 calls for a weight-import path FROM the
reference's `.pth.tar` checkpoint format (src/transformer/transformer.py
`serialize`/`load_model`: a torch.save dict carrying hyperparams +
state_dict) so bit-level loss parity can be grounded against real
reference checkpoints. The reference mount is empty, so the importer is
grounded two ways:

  * the in-repo torch twin (tpu_asr.parity.torch_twin), whose naming
    the tensor-shape map below consumes directly, and
  * KEY_ALIASES, pre-seeded with the kaituoxu/eastonYi-lineage module
    names the real reference is expected to use (SURVEY.md §2.1:
    `encoder.layer_stack.N.slf_attn.w_qs`, `decoder.tgt_word_emb`,
    `pos_ffn`, post-norm `layer_norm` inside each sublayer, espnet-style
    `ctc.ctc_lo`), exercised by a fixture test that constructs a
    reference-named state_dict and imports it without edits
    (tests/parity/test_torch_import.py).

The mapping is the exact inverse of torch_twin.import_flax_params:
  conv kernels   torch [out, in, kh, kw]  -> flax [kh, kw, in, out]
  linear weights torch [out, in]          -> flax [in, out]
  q/k/v proj     torch [d, d]             -> flax [d, H, dh]
  out proj       torch [d, H*dh]          -> flax [H, dh, d]
  layernorm      weight/bias              -> scale/bias
"""

from __future__ import annotations

import re

import numpy as np

from tpu_asr.models.config import ModelConfig

# Ordered (regex, replacement) renames: reference-style state_dict key ->
# twin/flax-style key the shape map below consumes. Applied top to
# bottom, every rule, via re.sub — idempotent on already-twin-style keys.
# The kaituoxu/Speech-Transformer lineage (which eastonYi extends) names
# its modules layer_stack/w_qs/w_ks/w_vs/fc/pos_ffn with the post-norm
# LayerNorm living INSIDE each sublayer module; the twin flattens those
# norms to per-layer norm_attn/norm_slf/norm_crs/norm_ffn.
KEY_ALIASES: list[tuple[str, str]] = [
    (r"^module\.", ""),                                  # DataParallel wrap
    (r"^(?:model\.)?encoder\.layer_stack\.(\d+)\.", r"enc_layers.\1."),
    (r"^(?:model\.)?decoder\.layer_stack\.(\d+)\.", r"dec_layers.\1."),
    # post-norm layer norms (inside sublayers in the reference lineage)
    (r"^(enc_layers\.\d+)\.slf_attn\.layer_norm\.", r"\1.norm_attn."),
    (r"^(dec_layers\.\d+)\.slf_attn\.layer_norm\.", r"\1.norm_slf."),
    (r"^(dec_layers\.\d+)\.enc_attn\.layer_norm\.", r"\1.norm_crs."),
    (r"\.pos_ffn\.layer_norm\.", ".norm_ffn."),
    # sublayer + projection names
    (r"\.pos_ffn\.", ".ffn."),
    (r"\.enc_attn\.", ".crs_attn."),
    (r"\.w_qs\.", ".q_proj."),
    (r"\.w_ks\.", ".k_proj."),
    (r"\.w_vs\.", ".v_proj."),
    (r"(_attn\.)fc\.", r"\1out_proj."),
    # decoder embedding / tied projection / encoder input
    (r"^(?:model\.)?decoder\.tgt_word_emb\.", "embed."),
    (r"^(?:model\.)?decoder\.tgt_word_prj\.", "out_proj."),
    (r"^(?:model\.)?encoder\.linear_in\.", "linear_in."),
    (r"^(?:model\.)?encoder\.layer_norm_in\.", "norm_in."),
    # conv2d subsampling front-end (eastonYi addition; name med-confidence
    # per SURVEY §2.1 — extend here if the real repo differs)
    (r"^(?:model\.)?encoder\.(?:conv\.|subsample\.)?conv[_]?([12])\.",
     r"subsample.conv\1."),
    (r"^(?:model\.)?encoder\.(?:conv\.|subsample\.)(?:out|linear_out)\.",
     "subsample.out."),
    # CTC head (espnet-style ctc.ctc_lo, or a bare linear)
    (r"^ctc\.ctc_lo\.", "ctc_proj."),
    (r"^(?:model\.)?ctc_lo\.", "ctc_proj."),
]


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t, dtype=np.float32)


def _apply_aliases(sd: dict) -> dict:
    out = {}
    for k, v in sd.items():
        for pat, repl in KEY_ALIASES:
            k = re.sub(pat, repl, k)
        out[k] = v
    return out


def infer_config_overrides(sd: dict) -> dict:
    """Derive ModelConfig fields the checkpoint's tensors pin down.

    The reference `serialize` blob stores some hyperparams but not all
    (notably never model_type or conv channel counts); an attention-only
    checkpoint imported with dataclass defaults would claim a CTC head it
    does not have. Works on an alias-normalized state_dict."""
    out: dict = {}
    n_enc = n_dec = -1
    for k in sd:
        m = re.match(r"enc_layers\.(\d+)\.", k)
        if m:
            n_enc = max(n_enc, int(m.group(1)))
        m = re.match(r"dec_layers\.(\d+)\.", k)
        if m:
            n_dec = max(n_dec, int(m.group(1)))
    if n_enc >= 0:
        out["num_enc_layers"] = n_enc + 1
    out["num_dec_layers"] = n_dec + 1
    has_ctc = "ctc_proj.weight" in sd
    has_dec = n_dec >= 0 or "embed.weight" in sd
    if any("assigner" in k for k in sd):
        out["model_type"] = "cif"
    elif has_ctc:
        out["model_type"] = "hybrid" if has_dec else "ctc"
    else:
        out["model_type"] = "transformer"
    if "subsample.conv1.weight" in sd:
        out["input_layer"] = "conv2d"
        c1 = _np(sd["subsample.conv1.weight"]).shape[0]
        c2 = _np(sd["subsample.conv2.weight"]).shape[0]
        out["conv_channels"] = c1 if c1 == c2 else (c1, c2)
    elif "linear_in.weight" in sd:
        out["input_layer"] = "linear"
    if "embed.weight" in sd:
        v, d = _np(sd["embed.weight"]).shape
        out["vocab_size"], out["d_model"] = int(v), int(d)
    elif has_ctc:
        v, d = _np(sd["ctc_proj.weight"]).shape
        out["vocab_size"], out["d_model"] = int(v), int(d)
    if "enc_layers.0.ffn.w_1.weight" in sd:
        out["d_inner"] = int(_np(sd["enc_layers.0.ffn.w_1.weight"]).shape[0])
    if has_dec:
        out["tie_embedding"] = "out_proj.weight" not in sd
    return out


def torch_state_dict_to_flax(sd: dict, cfg: ModelConfig) -> dict:
    """Reference/twin-format state_dict -> flax params pytree matching
    tpu_asr.models.Transformer ({'params': ...} NOT included)."""
    sd = _apply_aliases(sd)
    d, h = cfg.d_model, cfg.num_heads
    dh = d // h

    def conv(prefix):
        w = _np(sd[f"{prefix}.weight"])          # [out, in, kh, kw]
        return {"kernel": w.transpose(2, 3, 1, 0),
                "bias": _np(sd[f"{prefix}.bias"])}

    def linear(prefix):
        w = _np(sd[f"{prefix}.weight"])
        b = sd.get(f"{prefix}.bias")             # reference tgt_word_prj
        return {"kernel": w.T,                   # has bias=False
                "bias": (_np(b) if b is not None
                         else np.zeros(w.shape[0], np.float32))}

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
    else:
        enc["linear_in"] = linear("linear_in")
        enc["norm_in"] = {"scale": _np(sd["norm_in.weight"]),
                          "bias": _np(sd["norm_in.bias"])}
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
            # flax decoder out_proj is Dense(use_bias=False), matching the
            # reference's bias-free tgt_word_prj
            dec["out_proj"] = {"kernel": _np(sd["out_proj.weight"]).T}
        params["decoder"] = dec
    if cfg.model_type in ("ctc", "hybrid") and "ctc_proj.weight" in sd:
        params["ctc_head"] = {"ctc_proj": linear("ctc_proj")}
    return params


def load_torch_checkpoint(path: str, cfg: ModelConfig | None = None):
    """Load a reference-style `.pth.tar` (or bare state_dict) checkpoint.

    Returns ({'params': flax_tree}, cfg). Unwraps the common torch.save
    layouts: a bare state_dict, or a dict with 'state_dict'/'model' plus
    hyperparameters (reference Transformer.serialize stores args such as
    d_model/n_layers_enc/epoch/optim_dict alongside weights). When cfg is
    not given it is reconstructed from those stored args, with tensor-
    derived fields (model_type, conv channels, vocab size, layer counts,
    tied embedding) inferred from the state_dict itself so an attention-
    only checkpoint never inherits a hybrid default."""
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob
    if isinstance(blob, dict) and not any(
            hasattr(v, "shape") for v in blob.values()):
        for key in ("state_dict", "model", "model_state_dict"):
            if key in blob:
                sd = blob[key]
                break
    sd = _apply_aliases(dict(sd))
    if cfg is None:
        hyp = blob if isinstance(blob, dict) else {}
        inferred = infer_config_overrides(sd)
        cfg = ModelConfig(
            vocab_size=int(inferred.get(
                "vocab_size", hyp.get("vocab_size", ModelConfig.vocab_size))),
            d_model=int(inferred.get(
                "d_model", hyp.get("d_model", ModelConfig.d_model))),
            d_inner=int(inferred.get(
                "d_inner", hyp.get("d_inner", ModelConfig.d_inner))),
            num_heads=int(hyp.get("n_head", hyp.get("num_heads",
                                                    ModelConfig.num_heads))),
            num_enc_layers=int(inferred.get(
                "num_enc_layers",
                hyp.get("n_layers_enc", ModelConfig.num_enc_layers))),
            num_dec_layers=int(inferred.get(
                "num_dec_layers",
                hyp.get("n_layers_dec", ModelConfig.num_dec_layers))),
            model_type=inferred.get("model_type", ModelConfig.model_type),
            input_layer=inferred.get("input_layer", ModelConfig.input_layer),
            conv_channels=inferred.get("conv_channels",
                                       ModelConfig.conv_channels),
            tie_embedding=inferred.get("tie_embedding",
                                       ModelConfig.tie_embedding),
        )
    return {"params": torch_state_dict_to_flax(sd, cfg)}, cfg
