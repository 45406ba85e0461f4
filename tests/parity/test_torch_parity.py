"""Weight-import parity: identical weights + identical batch must give the
same losses (and the same greedy decode) in the torch twin as in JAX.
BASELINE.json: 'hybrid CTC/attention ... loss curves match bit-for-bit' —
realized as a weight-import harness + allclose at f32 tolerance."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from tpu_asr import IGNORE_ID
from tpu_asr.models import ModelConfig, Transformer

CFG = ModelConfig(vocab_size=24, d_input=20, d_model=32, d_inner=64,
                  num_heads=2, num_enc_layers=2, num_dec_layers=2,
                  dropout=0.0, model_type="hybrid", ctc_weight=0.3)


def make_batch(rng, b=3, t=45, u=6):
    feats = rng.standard_normal((b, t, CFG.d_input)).astype(np.float32)
    fl = np.asarray([t, t - 7, t - 15], np.int32)
    targets = np.full((b, u), IGNORE_ID, np.int32)
    tl = np.asarray([6, 4, 2], np.int32)
    for i in range(b):
        targets[i, : tl[i]] = rng.integers(2, 22, tl[i])
    return feats, fl, targets, tl


def test_losses_match_torch_twin(rng):
    from tpu_asr.parity.torch_twin import TorchTransformer, import_flax_params
    feats, fl, targets, tl = make_batch(rng)
    model = Transformer(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(fl), jnp.asarray(targets),
                        jnp.asarray(tl))
    out_jax = model.apply(params, jnp.asarray(feats), jnp.asarray(fl),
                          jnp.asarray(targets), jnp.asarray(tl))

    twin = TorchTransformer(CFG)
    import_flax_params(twin, params)
    twin.eval()
    out_t = twin.loss(torch.tensor(feats), torch.tensor(fl.astype(np.int64)),
                      torch.tensor(targets.astype(np.int64)),
                      torch.tensor(tl.astype(np.int64)))
    np.testing.assert_allclose(float(out_jax["loss_att"]),
                               float(out_t["loss_att"]), rtol=2e-4)
    np.testing.assert_allclose(float(out_jax["loss_ctc"]),
                               float(out_t["loss_ctc"]), rtol=2e-4)
    np.testing.assert_allclose(float(out_jax["loss"]),
                               float(out_t["loss"]), rtol=2e-4)


def test_greedy_decode_matches_torch_twin(rng):
    from tpu_asr.decode.greedy_ctc import ctc_greedy_decode
    from tpu_asr.parity.torch_twin import TorchTransformer, import_flax_params
    feats, fl, targets, tl = make_batch(rng)
    model = Transformer(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(fl), jnp.asarray(targets),
                        jnp.asarray(tl))
    enc, el = model.apply(params, jnp.asarray(feats), jnp.asarray(fl),
                          method=Transformer.encode)
    logits = model.apply(params, enc, method=Transformer.ctc_logits)
    toks, lens = ctc_greedy_decode(logits, el)
    jax_hyps = [np.asarray(toks)[i, : int(lens[i])].tolist()
                for i in range(3)]

    twin = TorchTransformer(CFG)
    import_flax_params(twin, params)
    twin.eval()
    torch_hyps = twin.greedy_ctc_decode(
        torch.tensor(feats), torch.tensor(fl.astype(np.int64)))
    assert jax_hyps == torch_hyps


def test_torch_checkpoint_import_roundtrip(rng, tmp_path):
    """flax -> twin -> reference-style .pth.tar -> flax again must be the
    identity (torch_import is the SURVEY §7 'weight-import path from the
    reference checkpoint format', exercised against the twin's
    reference-shaped state_dict)."""
    from tpu_asr.parity.torch_twin import TorchTransformer, import_flax_params
    from tpu_asr.parity.torch_import import (load_torch_checkpoint,
                                             torch_state_dict_to_flax)
    feats, fl, targets, tl = make_batch(rng)
    model = Transformer(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(fl), jnp.asarray(targets),
                        jnp.asarray(tl))
    twin = TorchTransformer(CFG)
    import_flax_params(twin, params)

    # direct state_dict import: exact tree equality
    back = torch_state_dict_to_flax(twin.state_dict(), CFG)
    flat_a = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=str(path))

    # reference-style serialized checkpoint (hyperparams + state_dict)
    ckpt = tmp_path / "epoch1.pth.tar"
    torch.save({"state_dict": twin.state_dict(), "epoch": 1,
                "vocab_size": CFG.vocab_size, "d_model": CFG.d_model,
                "d_inner": CFG.d_inner, "n_head": CFG.num_heads,
                "n_layers_enc": CFG.num_enc_layers,
                "n_layers_dec": CFG.num_dec_layers}, str(ckpt))
    imported, cfg2 = load_torch_checkpoint(str(ckpt), CFG)
    out_a = model.apply(params, jnp.asarray(feats), jnp.asarray(fl),
                        jnp.asarray(targets), jnp.asarray(tl))
    out_b = model.apply(imported, jnp.asarray(feats), jnp.asarray(fl),
                        jnp.asarray(targets), jnp.asarray(tl))
    np.testing.assert_allclose(float(out_a["loss"]), float(out_b["loss"]),
                               rtol=1e-6)


def test_asymmetric_conv_channels_parity(rng):
    """Tuple conv_channels (conv1 != conv2) round-trips through the twin
    and matches losses (the flagship aishell preset uses (32, 128))."""
    import dataclasses
    from tpu_asr.parity.torch_twin import TorchTransformer, import_flax_params
    cfg = dataclasses.replace(CFG, conv_channels=(4, 8))
    feats, fl, targets, tl = make_batch(rng)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(fl), jnp.asarray(targets),
                        jnp.asarray(tl))
    out_jax = model.apply(params, jnp.asarray(feats), jnp.asarray(fl),
                          jnp.asarray(targets), jnp.asarray(tl))
    twin = TorchTransformer(cfg)
    import_flax_params(twin, params)
    twin.eval()
    out_t = twin.loss(torch.tensor(feats), torch.tensor(fl.astype(np.int64)),
                      torch.tensor(targets.astype(np.int64)),
                      torch.tensor(tl.astype(np.int64)))
    np.testing.assert_allclose(float(out_jax["loss"]), float(out_t["loss"]),
                               rtol=2e-4)
