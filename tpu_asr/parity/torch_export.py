"""flax checkpoint -> reference-style torch `.pth.tar` export.

The inverse of tpu_asr.parity.torch_import: serialize a trained tpu-asr
model into the reference's checkpoint layout (Transformer.serialize — a
torch.save dict with hyperparams + a state_dict under the
kaituoxu/eastonYi-lineage module names: encoder.layer_stack.N.slf_attn.w_qs,
pos_ffn, decoder.tgt_word_emb, ctc.ctc_lo, ...). This closes the interop
loop: a user can train here and hand the weights back to a reference-style
PyTorch stack — and the round trip through torch_import restores the exact
flax tree (tests/parity/test_torch_export.py).

Supported model types: transformer / ctc / hybrid (the families the
reference checkpoint format covers).
"""

from __future__ import annotations

import numpy as np

from tpu_asr.models.config import ModelConfig


def _t(x):
    import torch
    return torch.tensor(np.asarray(x, dtype=np.float32))


def flax_to_reference_state_dict(params: dict, cfg: ModelConfig) -> dict:
    """flax param tree -> reference-named torch state_dict (CPU f32)."""
    assert cfg.model_type in ("transformer", "ctc", "hybrid"), \
        f"reference checkpoint format covers transformer/ctc/hybrid " \
        f"(got {cfg.model_type})"
    p = params["params"] if "params" in params else params
    d = cfg.d_model
    sd = {}

    def mha(dst, src):
        ren = {"q_proj": "w_qs", "k_proj": "w_ks", "v_proj": "w_vs",
               "out_proj": "fc"}
        for ours, theirs in ren.items():
            k = _t(src[ours]["kernel"])
            sd[f"{dst}.{theirs}.weight"] = (
                k.reshape(d, d).T if ours != "out_proj"
                else k.reshape(d, d).T)
            sd[f"{dst}.{theirs}.bias"] = _t(src[ours]["bias"]).reshape(-1)

    def ffn(dst, src):
        sd[f"{dst}.w_1.weight"] = _t(src["w_1"]["kernel"]).T
        sd[f"{dst}.w_1.bias"] = _t(src["w_1"]["bias"])
        sd[f"{dst}.w_2.weight"] = _t(src["w_2"]["kernel"]).T
        sd[f"{dst}.w_2.bias"] = _t(src["w_2"]["bias"])

    def ln(dst, src):
        sd[f"{dst}.weight"] = _t(src["LayerNorm_0"]["scale"])
        sd[f"{dst}.bias"] = _t(src["LayerNorm_0"]["bias"])

    enc = p["encoder"]
    if cfg.input_layer == "conv2d":
        sub = enc["subsample"]
        for i in ("1", "2"):
            sd[f"encoder.subsample.conv{i}.weight"] = _t(
                sub[f"conv{i}"]["kernel"]).permute(3, 2, 0, 1)
            sd[f"encoder.subsample.conv{i}.bias"] = _t(
                sub[f"conv{i}"]["bias"])
        sd["encoder.subsample.out.weight"] = _t(sub["out"]["kernel"]).T
        sd["encoder.subsample.out.bias"] = _t(sub["out"]["bias"])
    else:
        sd["encoder.linear_in.weight"] = _t(enc["linear_in"]["kernel"]).T
        sd["encoder.linear_in.bias"] = _t(enc["linear_in"]["bias"])
        sd["encoder.layer_norm_in.weight"] = _t(enc["norm_in"]["scale"])
        sd["encoder.layer_norm_in.bias"] = _t(enc["norm_in"]["bias"])

    for i in range(cfg.num_enc_layers):
        src = enc[f"layer_{i}"]
        dst = f"encoder.layer_stack.{i}"
        mha(f"{dst}.slf_attn", src["slf_attn"])
        ffn(f"{dst}.pos_ffn", src["ffn"])
        ln(f"{dst}.slf_attn.layer_norm", src["post_attn"])
        ln(f"{dst}.pos_ffn.layer_norm", src["post_ffn"])

    if cfg.model_type in ("transformer", "hybrid"):
        dec = p["decoder"]
        sd["decoder.tgt_word_emb.weight"] = _t(dec["embed"]["embedding"])
        if not cfg.tie_embedding:
            sd["decoder.tgt_word_prj.weight"] = _t(
                dec["out_proj"]["kernel"]).T
        for i in range(cfg.num_dec_layers):
            src = dec[f"layer_{i}"]
            dst = f"decoder.layer_stack.{i}"
            mha(f"{dst}.slf_attn", src["slf_attn"])
            mha(f"{dst}.enc_attn", src["crs_attn"])
            ffn(f"{dst}.pos_ffn", src["ffn"])
            ln(f"{dst}.slf_attn.layer_norm", src["post_slf"])
            ln(f"{dst}.enc_attn.layer_norm", src["post_crs"])
            ln(f"{dst}.pos_ffn.layer_norm", src["post_ffn"])

    if cfg.model_type in ("ctc", "hybrid"):
        ctc = p["ctc_head"]["ctc_proj"]
        sd["ctc.ctc_lo.weight"] = _t(ctc["kernel"]).T
        sd["ctc.ctc_lo.bias"] = _t(ctc["bias"])
    return sd


def export_torch_checkpoint(path: str, params: dict, cfg: ModelConfig,
                            epoch: int = 0, tr_loss: float = 0.0,
                            cv_loss: float = 0.0) -> None:
    """Write a reference-`serialize`-layout .pth.tar: hyperparams +
    state_dict (+ epoch/loss bookkeeping fields)."""
    import torch
    blob = {
        "state_dict": flax_to_reference_state_dict(params, cfg),
        # reference Transformer.serialize hyperparam fields
        "d_input": cfg.encoder_input_dim,
        "d_model": cfg.d_model,
        "d_inner": cfg.d_inner,
        "n_head": cfg.num_heads,
        "n_layers_enc": cfg.num_enc_layers,
        "n_layers_dec": cfg.num_dec_layers,
        "vocab_size": cfg.vocab_size,
        "tie_embedding": cfg.tie_embedding,
        "model_type": cfg.model_type,
        "epoch": epoch,
        "tr_loss": tr_loss,
        "cv_loss": cv_loss,
    }
    torch.save(blob, path)
