"""PyTorch-CPU twin of the CIF model — with a SEQUENTIAL fire loop.

Completes the BASELINE.json parity contract ("CIF quantity-loss ... match
bit-for-bit in loss curves"): this twin implements CIF exactly the way the
reference does — a python loop over frames doing accumulate-and-fire with
boundary weight splitting — while tpu_asr.models.cif uses the parallel
overlap-matmul. Identical weights + batch must give the same CE, quantity,
and CTC losses (tests/parity/test_torch_cif_parity.py).
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from tpu_asr.models.config import ModelConfig
from tpu_asr.models.modules import sinusoid_table
from tpu_asr.parity.torch_twin import (IGNORE_ID, TorchConvSubsample,
                                       TorchEncoderLayer,
                                       label_smoothing_loss_torch, _t)


class TorchAssigner(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.conv = nn.Conv1d(cfg.d_model, cfg.d_model, 3, padding=1)
        self.proj = nn.Linear(cfg.d_model, 1)

    def forward(self, enc_out, enc_lengths):
        h = F.relu(self.conv(enc_out.transpose(1, 2)).transpose(1, 2))
        alphas = torch.sigmoid(self.proj(h))[..., 0]
        t = alphas.shape[1]
        valid = torch.arange(t)[None, :] < enc_lengths[:, None]
        return alphas * valid, valid


def sequential_fire(hidden, alphas, u_max):
    """Reference-style CIF: python loop, accumulate-and-fire with boundary
    weight splitting; residual appended as the final (partial) fire."""
    b, t, d = hidden.shape
    fired = torch.zeros(b, u_max, d, dtype=hidden.dtype)
    for i in range(b):
        accum = hidden.new_zeros(())
        acc_vec = hidden.new_zeros(d)
        n = 0
        for j in range(t):
            a = alphas[i, j]
            h = hidden[i, j]
            if accum + a < 1.0:
                accum = accum + a
                acc_vec = acc_vec + a * h
            else:
                a1 = 1.0 - accum
                if n < u_max:
                    fired[i, n] = acc_vec + a1 * h
                n += 1
                accum = a - a1
                acc_vec = accum * h
        if n < u_max:
            fired[i, n] = acc_vec  # partial tail fire
    return fired


class TorchCifDecoder(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.cfg = cfg
        self.embed = nn.Embedding(cfg.vocab_size, cfg.d_model)
        self.fuse = nn.Linear(cfg.d_model, cfg.d_model)
        pe = torch.tensor(sinusoid_table(cfg.pe_maxlen, cfg.d_model))
        self.register_buffer("pe", pe)
        self.layers = nn.ModuleList(
            [TorchEncoderLayer(cfg) for _ in range(cfg.num_dec_layers)])

    def forward(self, ys_in, fired):
        u = ys_in.shape[1]
        scale = self.cfg.d_model ** 0.5
        y = self.embed(ys_in.long()) * scale + self.fuse(fired)
        y = y + self.pe[:u]
        causal = torch.tril(torch.ones(u, u, dtype=torch.bool))[None, None]
        for layer in self.layers:
            y = layer(y, causal)
        return y @ self.embed.weight.T


class TorchCifModel(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.cfg = cfg
        self.subsample = TorchConvSubsample(cfg)
        pe = torch.tensor(sinusoid_table(cfg.pe_maxlen, cfg.d_model))
        self.register_buffer("pe", pe)
        self.enc_layers = nn.ModuleList(
            [TorchEncoderLayer(cfg) for _ in range(cfg.num_enc_layers)])
        self.assigner = TorchAssigner(cfg)
        self.decoder = TorchCifDecoder(cfg)
        if cfg.ctc_weight > 0:
            self.ctc_proj = nn.Linear(cfg.d_model, cfg.vocab_size)
        self.sos = cfg.vocab_size - 2
        self.eos = cfg.vocab_size - 1

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
        alphas, valid = self.assigner(enc_out, enc_lengths)
        u_fire = target_lengths + 1
        total = alphas.sum(dim=1)
        loss_qty = (total - u_fire.float()).abs().mean()
        scaled = alphas * (u_fire.float() / total.clamp(min=1e-6))[:, None]
        b, u = targets.shape
        safe = torch.where(targets == IGNORE_ID,
                           torch.full_like(targets, self.eos), targets)
        ys_in = torch.cat(
            [torch.full((b, 1), self.sos, dtype=targets.dtype), safe], dim=1)
        base = torch.cat(
            [targets, torch.full((b, 1), IGNORE_ID, dtype=targets.dtype)],
            dim=1)
        pos = torch.arange(u + 1)[None, :]
        ys_out = torch.where(pos == target_lengths[:, None],
                             torch.full_like(base, self.eos), base)
        fired = sequential_fire(enc_out, scaled, ys_in.shape[1])
        logits = self.decoder(ys_in, fired)
        out = {"loss_qty": loss_qty,
               "loss_att": label_smoothing_loss_torch(
                   logits, ys_out, cfg.label_smoothing)}
        loss = out["loss_att"] + cfg.cif_quantity_weight * loss_qty
        if cfg.ctc_weight > 0:
            logp = F.log_softmax(self.ctc_proj(enc_out), dim=-1).transpose(0, 1)
            safe_t = torch.where(targets == IGNORE_ID,
                                 torch.zeros_like(targets), targets)
            out["loss_ctc"] = nn.CTCLoss(blank=0, reduction="mean",
                                         zero_infinity=True)(
                logp, safe_t, enc_lengths, target_lengths)
            loss = loss + cfg.ctc_weight * out["loss_ctc"]
        out["loss"] = loss
        return out


def import_flax_cif_params(model: TorchCifModel, params: dict) -> None:
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

    def enc_layer(dst, src):
        mha(f"{dst}.slf_attn", src["slf_attn"])
        ffn(f"{dst}.ffn", src["ffn"])
        ln(f"{dst}.norm_attn", src["post_attn"]["LayerNorm_0"])
        ln(f"{dst}.norm_ffn", src["post_ffn"]["LayerNorm_0"])

    for i in range(cfg.num_enc_layers):
        enc_layer(f"enc_layers.{i}", enc[f"layer_{i}"])

    asg = p["assigner"]
    # flax Conv (1D) kernel [k, in, out] -> torch Conv1d [out, in, k]
    sd["assigner.conv.weight"] = _t(asg["conv"]["kernel"]).permute(2, 1, 0)
    sd["assigner.conv.bias"] = _t(asg["conv"]["bias"])
    sd["assigner.proj.weight"] = _t(asg["proj"]["kernel"]).T
    sd["assigner.proj.bias"] = _t(asg["proj"]["bias"])

    dec = p["decoder"]
    sd["decoder.embed.weight"] = _t(dec["embed"]["embedding"])
    sd["decoder.fuse.weight"] = _t(dec["fuse"]["kernel"]).T
    sd["decoder.fuse.bias"] = _t(dec["fuse"]["bias"])
    for i in range(cfg.num_dec_layers):
        enc_layer(f"decoder.layers.{i}", dec[f"layer_{i}"])
    sd["decoder.pe"] = model.decoder.pe

    if cfg.ctc_weight > 0:
        ctc = p["ctc_head"]["ctc_proj"]
        sd["ctc_proj.weight"] = _t(ctc["kernel"]).T
        sd["ctc_proj.bias"] = _t(ctc["bias"])

    sd["pe"] = model.pe
    missing, unexpected = model.load_state_dict(sd, strict=True)
    assert not missing and not unexpected, (missing, unexpected)
