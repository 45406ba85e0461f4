"""Reference-import readiness (VERDICT r2 item 4).

The real reference's checkpoints use the kaituoxu/eastonYi-lineage module
naming (SURVEY §2.1: `encoder.layer_stack.N.slf_attn.w_qs`, post-norm
`layer_norm` inside each sublayer, `decoder.tgt_word_emb`, `pos_ffn`).
These tests construct a state_dict in exactly that naming (by renaming
the twin's reference-shaped tensors) plus the `serialize` blob layout
(epoch/optim_dict alongside hyperparams), and assert
`load_torch_checkpoint` imports it without edits — including inferring
model_type / conv channels / vocab / layer counts from the tensors
themselves when no ModelConfig is given."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tpu_asr import IGNORE_ID
from tpu_asr.models import ModelConfig, Transformer

CFG = ModelConfig(vocab_size=24, d_input=20, d_model=32, d_inner=64,
                  num_heads=2, num_enc_layers=2, num_dec_layers=2,
                  dropout=0.0, model_type="hybrid", ctc_weight=0.3,
                  conv_channels=(4, 8))

# twin-style -> kaituoxu/eastonYi-reference-style key renames (the exact
# inverse of torch_import.KEY_ALIASES, applied in inverse order)
TWIN_TO_REFERENCE = [
    (r"^enc_layers\.(\d+)\.norm_attn\.", r"enc_layers.\1.slf_attn.layer_norm."),
    (r"^dec_layers\.(\d+)\.norm_slf\.", r"dec_layers.\1.slf_attn.layer_norm."),
    (r"^dec_layers\.(\d+)\.norm_crs\.", r"dec_layers.\1.crs_attn.layer_norm."),
    (r"\.norm_ffn\.", ".ffn.layer_norm."),
    (r"(_attn\.)out_proj\.", r"\1fc."),
    (r"\.q_proj\.", ".w_qs."),
    (r"\.k_proj\.", ".w_ks."),
    (r"\.v_proj\.", ".w_vs."),
    (r"\.crs_attn\.", ".enc_attn."),
    (r"\.ffn\.", ".pos_ffn."),
    (r"^enc_layers\.(\d+)\.", r"encoder.layer_stack.\1."),
    (r"^dec_layers\.(\d+)\.", r"decoder.layer_stack.\1."),
    (r"^embed\.", "decoder.tgt_word_emb."),
    (r"^subsample\.conv([12])\.", r"encoder.conv.conv_\1."),
    (r"^subsample\.out\.", "encoder.conv.out."),
    (r"^ctc_proj\.", "ctc.ctc_lo."),
]


def reference_named_state_dict(twin_sd: dict) -> dict:
    out = {}
    for k, v in twin_sd.items():
        for pat, repl in TWIN_TO_REFERENCE:
            k = re.sub(pat, repl, k)
        out[k] = v
    return out


def make_setup(rng):
    feats = rng.standard_normal((2, 45, CFG.d_input)).astype(np.float32)
    fl = np.asarray([45, 30], np.int32)
    targets = np.full((2, 5), IGNORE_ID, np.int32)
    tl = np.asarray([5, 3], np.int32)
    for i in range(2):
        targets[i, : tl[i]] = rng.integers(2, 22, tl[i])
    model = Transformer(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(fl), jnp.asarray(targets),
                        jnp.asarray(tl))
    return model, params, (feats, fl, targets, tl)


def test_reference_named_checkpoint_imports(rng, tmp_path):
    """kaituoxu-named serialize blob -> load_torch_checkpoint with NO cfg:
    aliases + tensor inference reproduce the exact original tree."""
    from tpu_asr.parity.torch_import import load_torch_checkpoint
    from tpu_asr.parity.torch_twin import TorchTransformer, import_flax_params
    model, params, (feats, fl, targets, tl) = make_setup(rng)
    twin = TorchTransformer(CFG)
    import_flax_params(twin, params)
    ref_sd = reference_named_state_dict(twin.state_dict())
    assert any(k.startswith("encoder.layer_stack.0.slf_attn.w_qs")
               for k in ref_sd), "rename produced no reference-style keys"
    assert not any(".q_proj." in k or "enc_layers" in k for k in ref_sd)

    ckpt = tmp_path / "final.pth.tar"
    torch.save({"state_dict": ref_sd, "epoch": 7, "tr_loss": [1.0],
                "cv_loss": [2.0], "optim_dict": {}, "n_head": CFG.num_heads,
                "d_model": CFG.d_model, "d_inner": CFG.d_inner,
                "dropout": 0.1, "pe_maxlen": 5000}, str(ckpt))
    imported, cfg2 = load_torch_checkpoint(str(ckpt))   # cfg inferred

    assert cfg2.model_type == "hybrid"
    assert cfg2.input_layer == "conv2d"
    assert cfg2.conv_channels == (4, 8)
    assert (cfg2.vocab_size, cfg2.d_model, cfg2.d_inner) == (24, 32, 64)
    assert (cfg2.num_enc_layers, cfg2.num_dec_layers) == (2, 2)
    assert cfg2.tie_embedding

    flat_a = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(imported["params"])[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=str(path))
    # and the imported params actually run
    out = model.apply(imported, jnp.asarray(feats), jnp.asarray(fl),
                      jnp.asarray(targets), jnp.asarray(tl))
    assert np.isfinite(float(out["loss"]))


def test_attention_only_checkpoint_infers_transformer(rng, tmp_path):
    """An attention-only checkpoint (no ctc head) must NOT inherit the
    hybrid default model_type (ADVICE r2: a reference-style .pth.tar
    imported via --torch-ckpt alone then failed on missing ctc params)."""
    from tpu_asr.parity.torch_import import (infer_config_overrides,
                                             load_torch_checkpoint)
    from tpu_asr.parity.torch_twin import TorchTransformer, import_flax_params
    _, params, _ = make_setup(rng)
    twin = TorchTransformer(CFG)
    import_flax_params(twin, params)
    ref_sd = {k: v for k, v in reference_named_state_dict(
        twin.state_dict()).items() if not k.startswith("ctc.")}
    ckpt = tmp_path / "att_only.pth.tar"
    torch.save({"state_dict": ref_sd, "n_head": 2}, str(ckpt))
    imported, cfg2 = load_torch_checkpoint(str(ckpt))
    assert cfg2.model_type == "transformer"
    assert "ctc_head" not in imported["params"]

    # pure-CTC shape: no decoder keys either
    enc_only = {k: v for k, v in reference_named_state_dict(
        twin.state_dict()).items() if not k.startswith("decoder.")}
    from tpu_asr.parity.torch_import import _apply_aliases
    ov = infer_config_overrides(_apply_aliases(enc_only))
    assert ov["model_type"] == "ctc" and ov["num_dec_layers"] == 0


def test_untied_projection_imports_biasfree(rng, tmp_path):
    """Untied reference checkpoints carry a bias-free tgt_word_prj: the
    importer must map it to decoder.out_proj (Dense(use_bias=False)) and
    reproduce the exact flax tree."""
    import dataclasses
    from tpu_asr.parity.torch_import import load_torch_checkpoint
    from tpu_asr.parity.torch_twin import TorchTransformer, import_flax_params
    cfg = dataclasses.replace(CFG, tie_embedding=False)
    model = Transformer(cfg)
    rng_np = np.random.default_rng(0)
    feats = rng_np.standard_normal((1, 45, cfg.d_input)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(feats),
                        jnp.asarray([45], np.int32),
                        jnp.asarray([[3, 4]], np.int32),
                        jnp.asarray([2], np.int32))
    # twin has no untied head (it always ties); export the shared pieces
    # through it and attach the reference-style bias-free projection
    twin = TorchTransformer(CFG)
    import_flax_params(
        twin, {"params": {k: v for k, v in params["params"].items()}})
    sd = reference_named_state_dict(twin.state_dict())
    kern = np.asarray(params["params"]["decoder"]["out_proj"]["kernel"])
    sd["decoder.tgt_word_prj.weight"] = torch.tensor(kern.T.copy())
    torch.save({"state_dict": sd, "n_head": 2}, str(tmp_path / "u.pth.tar"))
    imported, cfg2 = load_torch_checkpoint(str(tmp_path / "u.pth.tar"))
    assert not cfg2.tie_embedding
    proj = imported["params"]["decoder"]["out_proj"]
    assert set(proj) == {"kernel"}          # bias-free like the flax module
    np.testing.assert_allclose(np.asarray(proj["kernel"]), kern, atol=1e-6)
    flat_a = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(imported["params"])[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
