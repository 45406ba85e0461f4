"""PyTorch-CPU twin of the flax model — the parity oracle and RTF baseline.

Plays the role of the reference implementation for two purposes pinned by
BASELINE.json:
  1. loss-curve parity ("bit-for-bit"): identical weights + batch must give
     the same hybrid CTC/attention (and CIF quantity) losses in torch as in
     JAX — this module imports flax params into an architecturally
     identical torch model and exposes the same loss computation;
  2. the decode-throughput baseline: the >=10x inverse-RTF target is
     measured against THIS model running on torch-CPU (the reference is a
     single-device PyTorch codebase; SURVEY.md section 6).

Written from scratch against the same math as tpu_asr.models (standard
Speech-Transformer wiring; no reference code available or copied).
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tpu_asr.models.config import ModelConfig
from tpu_asr.models.modules import sinusoid_table

IGNORE_ID = -1


class TorchMHA(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        d = cfg.d_model
        self.h = cfg.num_heads
        self.dh = cfg.d_head
        self.q_proj = nn.Linear(d, d)
        self.k_proj = nn.Linear(d, d)
        self.v_proj = nn.Linear(d, d)
        self.out_proj = nn.Linear(d, d)

    def forward(self, q_in, kv_in, mask=None):
        b, tq, d = q_in.shape
        tk = kv_in.shape[1]
        q = self.q_proj(q_in).view(b, tq, self.h, self.dh).transpose(1, 2)
        k = self.k_proj(kv_in).view(b, tk, self.h, self.dh).transpose(1, 2)
        v = self.v_proj(kv_in).view(b, tk, self.h, self.dh).transpose(1, 2)
        scores = q @ k.transpose(-1, -2) / math.sqrt(self.dh)
        if mask is not None:
            scores = scores.masked_fill(~mask, -1e30)
        probs = torch.softmax(scores, dim=-1)
        out = (probs @ v).transpose(1, 2).reshape(b, tq, d)
        return self.out_proj(out)


class TorchFFN(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.w_1 = nn.Linear(cfg.d_model, cfg.d_inner)
        self.w_2 = nn.Linear(cfg.d_inner, cfg.d_model)

    def forward(self, x):
        return self.w_2(F.relu(self.w_1(x)))


class TorchEncoderLayer(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.slf_attn = TorchMHA(cfg)
        self.ffn = TorchFFN(cfg)
        self.norm_attn = nn.LayerNorm(cfg.d_model, eps=1e-6)
        self.norm_ffn = nn.LayerNorm(cfg.d_model, eps=1e-6)

    def forward(self, x, mask):
        x = self.norm_attn(x + self.slf_attn(x, x, mask))
        return self.norm_ffn(x + self.ffn(x))


class TorchDecoderLayer(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.slf_attn = TorchMHA(cfg)
        self.crs_attn = TorchMHA(cfg)
        self.ffn = TorchFFN(cfg)
        self.norm_slf = nn.LayerNorm(cfg.d_model, eps=1e-6)
        self.norm_crs = nn.LayerNorm(cfg.d_model, eps=1e-6)
        self.norm_ffn = nn.LayerNorm(cfg.d_model, eps=1e-6)

    def forward(self, y, enc, self_mask, cross_mask):
        y = self.norm_slf(y + self.slf_attn(y, y, self_mask))
        y = self.norm_crs(y + self.crs_attn(y, enc, cross_mask))
        return self.norm_ffn(y + self.ffn(y))


class TorchConvSubsample(nn.Module):
    def __init__(self, cfg: ModelConfig, channels=None):
        super().__init__()
        channels = cfg.conv_channels if channels is None else channels
        c1, c2 = (channels if isinstance(channels, (tuple, list))
                  else (channels, channels))
        self.conv1 = nn.Conv2d(1, c1, 3, stride=2)
        self.conv2 = nn.Conv2d(c1, c2, 3, stride=2)
        f = cfg.d_input
        f = (f - 1) // 2
        f = (f - 1) // 2
        self.out = nn.Linear(f * c2, cfg.d_model)

    def forward(self, feats, feat_lengths):
        x = feats.unsqueeze(1)                       # [B,1,T,D]
        x = F.relu(self.conv1(x))
        x = F.relu(self.conv2(x))
        b, c, t, f = x.shape
        # match flax layout [B, T', F', C] -> flatten (F', C)
        x = x.permute(0, 2, 3, 1).reshape(b, t, f * c)
        x = self.out(x)
        out_lengths = torch.clamp(((feat_lengths - 1) // 2 - 1) // 2, min=0)
        return x, out_lengths


class TorchTransformer(nn.Module):
    """Hybrid CTC/attention Speech-Transformer, mirroring tpu_asr.models."""

    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.cfg = cfg
        self.subsample = TorchConvSubsample(cfg)
        pe = torch.tensor(sinusoid_table(cfg.pe_maxlen, cfg.d_model))
        self.register_buffer("pe", pe)
        self.enc_layers = nn.ModuleList(
            [TorchEncoderLayer(cfg) for _ in range(cfg.num_enc_layers)])
        self.embed = nn.Embedding(cfg.vocab_size, cfg.d_model)
        self.dec_layers = nn.ModuleList(
            [TorchDecoderLayer(cfg) for _ in range(cfg.num_dec_layers)])
        self.ctc_proj = nn.Linear(cfg.d_model, cfg.vocab_size)
        self.sos = cfg.vocab_size - 2
        self.eos = cfg.vocab_size - 1

    def encode(self, feats, feat_lengths):
        x, out_lengths = self.subsample(feats, feat_lengths)
        x = x + self.pe[: x.shape[1]]
        t = x.shape[1]
        valid = (torch.arange(t)[None, :] < out_lengths[:, None])
        mask = valid[:, None, None, :]
        for layer in self.enc_layers:
            x = layer(x, mask)
        x = x * valid[..., None].float()
        return x, out_lengths

    def decode_logits(self, enc_out, enc_lengths, ys_in):
        b, u = ys_in.shape
        scale = self.cfg.d_model ** 0.5
        y = self.embed(ys_in.long()) * scale + self.pe[:u]
        causal = torch.tril(torch.ones(u, u, dtype=torch.bool))
        self_mask = causal[None, None]
        t = enc_out.shape[1]
        cross_mask = (torch.arange(t)[None, :]
                      < enc_lengths[:, None])[:, None, None, :]
        for layer in self.dec_layers:
            y = layer(y, enc_out, self_mask, cross_mask)
        return y @ self.embed.weight.T    # tied projection

    def ctc_logits(self, enc_out):
        return self.ctc_proj(enc_out)

    def loss(self, feats, feat_lengths, targets, target_lengths):
        cfg = self.cfg
        enc_out, enc_lengths = self.encode(feats, feat_lengths)
        out = {}
        # attention branch
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
        logits = self.decode_logits(enc_out, enc_lengths, ys_in)
        out["loss_att"] = label_smoothing_loss_torch(
            logits, ys_out, cfg.label_smoothing)
        # ctc branch
        ctc_lg = self.ctc_logits(enc_out)
        logp = F.log_softmax(ctc_lg, dim=-1).transpose(0, 1)
        safe_t = torch.where(targets == IGNORE_ID,
                             torch.zeros_like(targets), targets)
        out["loss_ctc"] = nn.CTCLoss(blank=0, reduction="mean",
                                     zero_infinity=True)(
            logp, safe_t, enc_lengths, target_lengths)
        lam = cfg.ctc_weight
        out["loss"] = lam * out["loss_ctc"] + (1 - lam) * out["loss_att"]
        return out

    @torch.no_grad()
    def greedy_ctc_decode(self, feats, feat_lengths):
        enc_out, enc_lengths = self.encode(feats, feat_lengths)
        ids = self.ctc_logits(enc_out).argmax(-1)
        hyps = []
        for b in range(ids.shape[0]):
            prev, seq = -1, []
            for t in range(int(enc_lengths[b])):
                s = int(ids[b, t])
                if s != 0 and s != prev:
                    seq.append(s)
                prev = s
            hyps.append(seq)
        return hyps

    @torch.no_grad()
    def recognize_beam_joint(self, feats, feat_lengths, beam=5, max_len=64,
                             ctc_weight=0.0, ctc_cand=0, nbest=1):
        """Reference-style host-driven beam search with optional joint
        CTC/attention scoring, batch=1.

        Control flow follows the reference `Decoder.recognize_beam`
        (SURVEY.md 3.2: per-token python loop, per-hypothesis decoder
        forwards, ended hypotheses set aside, eos appended at maxlen) with
        the joint-scoring variant interleaving CTC prefix scores
        (Watanabe et al. hybrid decoding). This is the parity oracle the
        compiled `tpu_asr.decode.beam.attention_beam_search` must agree
        with at the hypothesis level.

        Returns a list of (token_seq, score) pairs, best first.
        """
        enc_out, enc_lengths = self.encode(feats, feat_lengths)
        t_enc = int(enc_lengths[0])
        use_ctc = ctc_weight > 0.0
        scorer = None
        r0 = None
        if use_ctc:
            lpz = F.log_softmax(
                self.ctc_logits(enc_out).double(), dim=-1)[0, :t_enc]
            scorer = HostCTCPrefixScore(lpz.numpy(), blank=0, eos=self.eos)
            r0 = scorer.initial_state()
        k_cand = (ctc_cand or 2 * beam) if use_ctc else beam
        hyps = [{"seq": [int(self.sos)], "score": 0.0, "r": r0, "psi": 0.0}]
        ended = []
        for i in range(max_len):
            cands = []
            for hyp in hyps:
                ys = torch.tensor([hyp["seq"]])
                logits = self.decode_logits(enc_out, enc_lengths, ys)
                att_lp = F.log_softmax(logits[0, -1].double(), dim=-1)
                if use_ctc:
                    top = torch.topk(att_lp, min(k_cand, att_lp.shape[-1]))
                    ids = [int(c) for c in top.indices]
                    if self.eos not in ids:
                        ids.append(int(self.eos))
                    psi, r_new = scorer.score(
                        hyp["seq"][-1], len(hyp["seq"]) == 1, hyp["r"],
                        np.asarray(ids))
                    for j, c in enumerate(ids):
                        sc = (hyp["score"]
                              + (1.0 - ctc_weight) * float(att_lp[c])
                              + ctc_weight * (float(psi[j]) - hyp["psi"]))
                        is_eos = c == self.eos
                        cands.append({
                            "seq": hyp["seq"] + [c], "score": sc,
                            "r": hyp["r"] if is_eos else r_new[j],
                            "psi": hyp["psi"] if is_eos else float(psi[j])})
                else:
                    top = torch.topk(att_lp, min(beam, att_lp.shape[-1]))
                    for lp, c in zip(top.values, top.indices):
                        cands.append({"seq": hyp["seq"] + [int(c)],
                                      "score": hyp["score"] + float(lp),
                                      "r": None, "psi": 0.0})
            cands.sort(key=lambda h: -h["score"])
            kept = cands[:beam]
            if i == max_len - 1:
                # reference appends eos at maxlen without scoring it
                for h in kept:
                    if h["seq"][-1] != self.eos:
                        h["seq"].append(int(self.eos))
            hyps = []
            for h in kept:
                if h["seq"][-1] == self.eos:
                    ended.append(h)
                else:
                    hyps.append(h)
            if not hyps:
                break
        ended.sort(key=lambda h: -h["score"])
        return [([t for t in h["seq"][1:] if t != self.eos], h["score"])
                for h in ended[:nbest]]

    @torch.no_grad()
    def beam_decode_utt(self, feats, feat_lengths, beam=5, max_len=64):
        """Reference-style host-driven beam search, batch=1 (for the RTF
        baseline: this is how the reference decodes)."""
        enc_out, enc_lengths = self.encode(feats, feat_lengths)
        hyps = [([int(self.sos)], 0.0)]
        finished = []
        for _ in range(max_len):
            cand = []
            for seq, score in hyps:
                ys = torch.tensor([seq])
                logits = self.decode_logits(enc_out, enc_lengths, ys)
                logp = F.log_softmax(logits[0, -1], dim=-1)
                top = torch.topk(logp, beam)
                for lp, tok in zip(top.values, top.indices):
                    cand.append((seq + [int(tok)], score + float(lp)))
            cand.sort(key=lambda x: -x[1])
            hyps = []
            for seq, score in cand[: beam * 2]:
                if seq[-1] == self.eos:
                    finished.append((seq, score))
                else:
                    hyps.append((seq, score))
                if len(hyps) >= beam:
                    break
            if not hyps:
                break
        finished.extend(hyps)
        finished.sort(key=lambda x: -x[1])
        best = finished[0][0]
        return [t for t in best[1:] if t != self.eos]


class HostCTCPrefixScore:
    """Per-utterance CTC prefix scorer, float64 numpy — the host oracle.

    Same recursion as tpu_asr.decode.ctc_prefix.CTCPrefixScorer (Watanabe
    et al. hybrid decoding; verified against brute-force path enumeration
    in tests/unit/test_decode.py), but host-driven per hypothesis, the way
    the reference's recognize path scores prefixes.
    """

    def __init__(self, logp: np.ndarray, blank: int = 0,
                 eos: int | None = None):
        """logp: [T, V] log-softmaxed CTC posteriors, true length only."""
        self.logp = np.asarray(logp, dtype=np.float64)
        self.t, self.v = self.logp.shape
        self.blank = blank
        self.eos = eos

    def initial_state(self) -> np.ndarray:
        """r [T, 2] for the empty prefix: r[:, 0]=r_nb=-inf,
        r[:, 1]=r_b=cumulative blank log-prob."""
        r = np.full((self.t, 2), -np.inf)
        r[:, 1] = np.cumsum(self.logp[:, self.blank])
        return r

    def score(self, g_last: int, is_first: bool, r_prev: np.ndarray,
              cands: np.ndarray):
        """Score K candidate extensions of prefix g.

        Returns (psi [K] prefix log-probs, r_new [K, T, 2]). eos candidates
        get P(g complete) and should keep the old state.
        """
        k = len(cands)
        x_c = self.logp[:, cands]                       # [T, K]
        x_b = self.logp[:, self.blank]                  # [T]
        same = cands == g_last                          # [K]
        phi = np.logaddexp(
            r_prev[:, 1:2],
            np.where(same[None, :], -np.inf, r_prev[:, 0:1]))   # [T, K]
        r_nb = np.full((self.t, k), -np.inf)
        r_b = np.full((self.t, k), -np.inf)
        r_nb[0] = x_c[0] if is_first else -np.inf
        psi = r_nb[0].copy()
        for t in range(1, self.t):
            r_nb[t] = np.logaddexp(r_nb[t - 1], phi[t - 1]) + x_c[t]
            r_b[t] = np.logaddexp(r_nb[t - 1], r_b[t - 1]) + x_b[t]
            psi = np.logaddexp(psi, phi[t - 1] + x_c[t])
        if self.eos is not None:
            g_complete = np.logaddexp(r_prev[-1, 0], r_prev[-1, 1])
            psi = np.where(cands == self.eos, g_complete, psi)
        return psi, np.stack([r_nb.T, r_b.T], axis=-1)  # [K, T, 2]


def label_smoothing_loss_torch(logits, targets, eps):
    v = logits.shape[-1]
    valid = targets != IGNORE_ID
    safe = torch.where(valid, targets, torch.zeros_like(targets))
    logp = F.log_softmax(logits.double(), dim=-1)
    lp_t = logp.gather(-1, safe.unsqueeze(-1).long()).squeeze(-1)
    off = eps / (v - 1)
    nll = -((1 - eps - off) * lp_t + off * logp.sum(-1))
    n = valid.sum().clamp(min=1)
    return (nll * valid).sum() / n


# ---- flax -> torch weight import ----

def _t(x):
    return torch.tensor(np.asarray(x, dtype=np.float32))


def import_flax_params(model: TorchTransformer, params: dict) -> None:
    """Load tpu_asr.models.Transformer params into the torch twin."""
    cfg = model.cfg
    p = params["params"] if "params" in params else params
    enc = p["encoder"]
    sub = enc["subsample"]
    sd = {}
    sd["subsample.conv1.weight"] = _t(sub["conv1"]["kernel"]).permute(3, 2, 0, 1)
    sd["subsample.conv1.bias"] = _t(sub["conv1"]["bias"])
    sd["subsample.conv2.weight"] = _t(sub["conv2"]["kernel"]).permute(3, 2, 0, 1)
    sd["subsample.conv2.bias"] = _t(sub["conv2"]["bias"])
    sd["subsample.out.weight"] = _t(sub["out"]["kernel"]).T
    sd["subsample.out.bias"] = _t(sub["out"]["bias"])

    def mha(dst, src):
        d = cfg.d_model
        for name in ("q_proj", "k_proj", "v_proj"):
            kern = _t(src[name]["kernel"]).reshape(d, d)   # [in, H*dh]
            sd[f"{dst}.{name}.weight"] = kern.T
            sd[f"{dst}.{name}.bias"] = _t(src[name]["bias"]).reshape(d)
        kern = _t(src["out_proj"]["kernel"]).reshape(d, d)  # [H*dh, out]
        sd[f"{dst}.out_proj.weight"] = kern.T
        sd[f"{dst}.out_proj.bias"] = _t(src["out_proj"]["bias"])

    def ffn(dst, src):
        sd[f"{dst}.w_1.weight"] = _t(src["w_1"]["kernel"]).T
        sd[f"{dst}.w_1.bias"] = _t(src["w_1"]["bias"])
        sd[f"{dst}.w_2.weight"] = _t(src["w_2"]["kernel"]).T
        sd[f"{dst}.w_2.bias"] = _t(src["w_2"]["bias"])

    def ln(dst, src):
        sd[f"{dst}.weight"] = _t(src["scale"])
        sd[f"{dst}.bias"] = _t(src["bias"])

    for i in range(cfg.num_enc_layers):
        src = enc[f"layer_{i}"]
        mha(f"enc_layers.{i}.slf_attn", src["slf_attn"])
        ffn(f"enc_layers.{i}.ffn", src["ffn"])
        ln(f"enc_layers.{i}.norm_attn", src["post_attn"]["LayerNorm_0"])
        ln(f"enc_layers.{i}.norm_ffn", src["post_ffn"]["LayerNorm_0"])

    dec = p["decoder"]
    sd["embed.weight"] = _t(dec["embed"]["embedding"])
    for i in range(cfg.num_dec_layers):
        src = dec[f"layer_{i}"]
        mha(f"dec_layers.{i}.slf_attn", src["slf_attn"])
        mha(f"dec_layers.{i}.crs_attn", src["crs_attn"])
        ffn(f"dec_layers.{i}.ffn", src["ffn"])
        ln(f"dec_layers.{i}.norm_slf", src["post_slf"]["LayerNorm_0"])
        ln(f"dec_layers.{i}.norm_crs", src["post_crs"]["LayerNorm_0"])
        ln(f"dec_layers.{i}.norm_ffn", src["post_ffn"]["LayerNorm_0"])

    ctc = p["ctc_head"]["ctc_proj"]
    sd["ctc_proj.weight"] = _t(ctc["kernel"]).T
    sd["ctc_proj.bias"] = _t(ctc["bias"])

    sd["pe"] = model.pe
    missing, unexpected = model.load_state_dict(sd, strict=True)
    assert not missing and not unexpected, (missing, unexpected)
