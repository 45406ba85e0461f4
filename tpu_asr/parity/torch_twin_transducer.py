"""PyTorch-CPU twin of the transducer model — reference-style host math.

Parity oracle for the RNN-T family (the op-level loss already has a
brute-force + autograd twin in tests/unit/test_transducer.py; this twin
pins the FULL model): identical weights + batch must give the same
loss_rnnt / loss_ctc as tpu_asr.models.transducer (tested in
tests/parity/test_torch_transducer_parity.py). The lattice DP here is the
textbook per-utterance nested python loop (Graves, arXiv:1211.3711) —
deliberately the opposite implementation style from the JAX
associative-scan/fused version it validates.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from tpu_asr.models.config import ModelConfig
from tpu_asr.models.modules import sinusoid_table
from tpu_asr.parity.torch_twin import (IGNORE_ID, TorchConvSubsample,
                                       TorchEncoderLayer, _t)


class TorchPredictor(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.cfg = cfg
        self.embed = nn.Embedding(cfg.vocab_size, cfg.d_model)
        pe = torch.tensor(sinusoid_table(cfg.pe_maxlen, cfg.d_model))
        self.register_buffer("pe", pe)
        self.layers = nn.ModuleList(
            [TorchEncoderLayer(cfg) for _ in range(cfg.num_pred_layers)])

    def forward(self, ys_in):
        u1 = ys_in.shape[1]
        y = self.embed(ys_in.long()) * self.cfg.d_model ** 0.5
        y = y + self.pe[:u1]
        causal = (torch.arange(u1)[None, :]
                  <= torch.arange(u1)[:, None])[None, None]
        for layer in self.layers:
            y = layer(y, causal)
        return y


def transducer_nll_dp(log_probs, labels, t_len, u_len, blank=0):
    """Per-utterance alpha DP (python loops) over log-softmaxed joint
    outputs [T, U1, V]; returns the NLL scalar (torch, autograd-able)."""
    alpha = {(0, 0): torch.zeros(())}
    for t in range(t_len):
        for u in range(u_len + 1):
            if (t, u) not in alpha:
                continue
            a = alpha[(t, u)]
            nb = a + log_probs[t, u, blank]
            key = (t + 1, u)
            alpha[key] = (torch.logaddexp(alpha[key], nb)
                          if key in alpha else nb)
            if u < u_len:
                ne = a + log_probs[t, u, labels[u]]
                key = (t, u + 1)
                alpha[key] = (torch.logaddexp(alpha[key], ne)
                              if key in alpha else ne)
    return -alpha[(t_len, u_len)]


class TorchTransducerModel(nn.Module):
    """Encoder (shared structure with TorchTransformer) + predictor +
    additive tanh joint; loss mirrors models/transducer.py exactly."""

    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.cfg = cfg
        self.subsample = TorchConvSubsample(cfg)
        pe = torch.tensor(sinusoid_table(cfg.pe_maxlen, cfg.d_model))
        self.register_buffer("pe", pe)
        self.enc_layers = nn.ModuleList(
            [TorchEncoderLayer(cfg) for _ in range(cfg.num_enc_layers)])
        self.predictor = TorchPredictor(cfg)
        self.enc_proj = nn.Linear(cfg.d_model, cfg.d_joint)
        self.pred_proj = nn.Linear(cfg.d_model, cfg.d_joint)
        self.joint_out = nn.Linear(cfg.d_joint, cfg.vocab_size)
        if cfg.ctc_weight > 0:
            self.ctc_proj = nn.Linear(cfg.d_model, cfg.vocab_size)
        self.sos = cfg.vocab_size - 2

    def encode(self, feats, feat_lengths):
        x, out_lengths = self.subsample(feats, feat_lengths)
        x = x + self.pe[: x.shape[1]]
        t = x.shape[1]
        valid = torch.arange(t)[None, :] < out_lengths[:, None]
        mask = valid[:, None, None, :]
        for layer in self.enc_layers:
            x = layer(x, mask)
        x = x * valid[..., None].float()
        return x, out_lengths

    def loss(self, feats, feat_lengths, targets, target_lengths):
        cfg = self.cfg
        enc_out, enc_lengths = self.encode(feats, feat_lengths)
        f = self.enc_proj(enc_out)                            # [B, T, H]
        b = targets.shape[0]
        safe = torch.where(targets == IGNORE_ID,
                           torch.zeros_like(targets), targets)
        ys_in = torch.cat(
            [torch.full((b, 1), self.sos, dtype=targets.dtype), safe],
            dim=1)
        g = self.pred_proj(self.predictor(ys_in))             # [B, U1, H]
        nlls = []
        for i in range(b):
            joint = torch.tanh(f[i, :, None, :] + g[i, None, :, :])
            lp = F.log_softmax(self.joint_out(joint), dim=-1)
            nlls.append(transducer_nll_dp(
                lp, [int(x) for x in safe[i]], int(enc_lengths[i]),
                int(target_lengths[i])))
        nll = torch.stack(nlls)
        loss_rnnt = (nll / target_lengths.clamp(min=1).float()).mean()
        out = {"loss_rnnt": loss_rnnt}
        loss = loss_rnnt
        if cfg.ctc_weight > 0:
            logp = F.log_softmax(self.ctc_proj(enc_out),
                                 dim=-1).transpose(0, 1)
            out["loss_ctc"] = nn.CTCLoss(blank=0, reduction="mean",
                                         zero_infinity=True)(
                logp, safe, enc_lengths, target_lengths)
            loss = cfg.ctc_weight * out["loss_ctc"] \
                + (1.0 - cfg.ctc_weight) * loss
        out["loss"] = loss
        return out


def import_flax_transducer_params(model: TorchTransducerModel,
                                  params: dict) -> None:
    cfg = model.cfg
    p = params["params"] if "params" in params else params
    sd = {}
    enc = p["encoder"]
    sub = enc["subsample"]
    sd["subsample.conv1.weight"] = _t(sub["conv1"]["kernel"]).permute(3, 2, 0, 1)
    sd["subsample.conv1.bias"] = _t(sub["conv1"]["bias"])
    sd["subsample.conv2.weight"] = _t(sub["conv2"]["kernel"]).permute(3, 2, 0, 1)
    sd["subsample.conv2.bias"] = _t(sub["conv2"]["bias"])
    sd["subsample.out.weight"] = _t(sub["out"]["kernel"]).T
    sd["subsample.out.bias"] = _t(sub["out"]["bias"])

    d = cfg.d_model

    def mha(dst, src):
        for name in ("q_proj", "k_proj", "v_proj"):
            sd[f"{dst}.{name}.weight"] = _t(src[name]["kernel"]).reshape(d, d).T
            sd[f"{dst}.{name}.bias"] = _t(src[name]["bias"]).reshape(d)
        sd[f"{dst}.out_proj.weight"] = _t(src["out_proj"]["kernel"]).reshape(d, d).T
        sd[f"{dst}.out_proj.bias"] = _t(src["out_proj"]["bias"])

    def ffn(dst, src):
        sd[f"{dst}.w_1.weight"] = _t(src["w_1"]["kernel"]).T
        sd[f"{dst}.w_1.bias"] = _t(src["w_1"]["bias"])
        sd[f"{dst}.w_2.weight"] = _t(src["w_2"]["kernel"]).T
        sd[f"{dst}.w_2.bias"] = _t(src["w_2"]["bias"])

    def ln(dst, src):
        sd[f"{dst}.weight"] = _t(src["scale"])
        sd[f"{dst}.bias"] = _t(src["bias"])

    def enc_layer(dst, src, post_attn_key="post_attn"):
        mha(f"{dst}.slf_attn", src["slf_attn"])
        ffn(f"{dst}.ffn", src["ffn"])
        ln(f"{dst}.norm_attn", src[post_attn_key]["LayerNorm_0"])
        ln(f"{dst}.norm_ffn", src["post_ffn"]["LayerNorm_0"])

    for i in range(cfg.num_enc_layers):
        enc_layer(f"enc_layers.{i}", enc[f"layer_{i}"])

    pred = p["predictor"]
    sd["predictor.embed.weight"] = _t(pred["embed"]["embedding"])
    for i in range(cfg.num_pred_layers):
        # LMLayer names its post-norms post_slf/post_ffn
        enc_layer(f"predictor.layers.{i}", pred[f"layer_{i}"],
                  post_attn_key="post_slf")
    sd["predictor.pe"] = model.predictor.pe

    sd["enc_proj.weight"] = _t(p["enc_proj"]["kernel"]).T
    sd["enc_proj.bias"] = _t(p["enc_proj"]["bias"])
    sd["pred_proj.weight"] = _t(p["pred_proj"]["kernel"]).T
    sd["pred_proj.bias"] = _t(p["pred_proj"]["bias"])
    sd["joint_out.weight"] = _t(p["joint_out_kernel"]).T
    sd["joint_out.bias"] = _t(p["joint_out_bias"])

    if cfg.ctc_weight > 0:
        ctc = p["ctc_head"]["ctc_proj"]
        sd["ctc_proj.weight"] = _t(ctc["kernel"]).T
        sd["ctc_proj.bias"] = _t(ctc["bias"])

    sd["pe"] = model.pe
    missing, unexpected = model.load_state_dict(sd, strict=True)
    assert not missing and not unexpected, (missing, unexpected)
