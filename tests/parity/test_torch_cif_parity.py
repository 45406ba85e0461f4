"""CIF parity: identical weights + batch -> same CE + quantity (+ CTC)
losses in the torch twin — whose fire step is the reference-style
SEQUENTIAL accumulate-and-fire loop — as in the JAX overlap-matmul model.
This is the BASELINE.json 'CIF quantity-loss curves match' contract."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from tpu_asr import IGNORE_ID
from tpu_asr.models import CifModel, ModelConfig

CFG = ModelConfig(vocab_size=24, d_input=20, d_model=32, d_inner=64,
                  num_heads=2, num_enc_layers=2, num_dec_layers=2,
                  dropout=0.0, model_type="cif", ctc_weight=0.5,
                  cif_quantity_weight=1.0)


def make_batch(rng, b=3, t=45, u=6):
    feats = rng.standard_normal((b, t, CFG.d_input)).astype(np.float32)
    fl = np.asarray([t, t - 7, t - 15], np.int32)
    targets = np.full((b, u), IGNORE_ID, np.int32)
    tl = np.asarray([6, 4, 2], np.int32)
    for i in range(b):
        targets[i, : tl[i]] = rng.integers(2, 22, tl[i])
    return feats, fl, targets, tl


def test_cif_losses_match_torch_twin(rng):
    from tpu_asr.parity.torch_twin_cif import (TorchCifModel,
                                               import_flax_cif_params)
    feats, fl, targets, tl = make_batch(rng)
    model = CifModel(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(fl), jnp.asarray(targets),
                        jnp.asarray(tl))
    out_jax = model.apply(params, jnp.asarray(feats), jnp.asarray(fl),
                          jnp.asarray(targets), jnp.asarray(tl))

    twin = TorchCifModel(CFG)
    import_flax_cif_params(twin, params)
    twin.eval()
    with torch.no_grad():
        out_t = twin.loss(torch.tensor(feats),
                          torch.tensor(fl.astype(np.int64)),
                          torch.tensor(targets.astype(np.int64)),
                          torch.tensor(tl.astype(np.int64)))
    for key, tol in (("loss_qty", 5e-4), ("loss_att", 5e-4),
                     ("loss_ctc", 5e-4), ("loss", 5e-4)):
        a, b = float(out_jax[key]), float(out_t[key])
        np.testing.assert_allclose(a, b, rtol=tol, err_msg=key)
