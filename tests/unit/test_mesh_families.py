"""dp x tp mesh equality for the NON-hybrid model families (VERDICT r4
item 4): CIF, transducer, and conformer-hybrid train steps under a
data=4 x model=2 mesh must produce the same loss / grad norm / gradient
tree as the single-device step, and one decode mode per family must
return identical hypotheses under a data-parallel mesh.

The hybrid flagship has had this since r2 (test_train.py /
test_decode.py); these families were only covered at liveness level.
The TP rules (parallel/sharding.py) shard attention q/k/v/out heads and
FFN d_inner — the conformer reshapes attention internals (rel-pos MHSA)
and the transducer adds predictor/joint params the rules leave
replicated, so GSPMD resharding around those boundaries is exactly what
needs pinning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr import IGNORE_ID
from tpu_asr.models import ModelConfig, build_model

pytestmark = pytest.mark.slow

FAMILIES = {
    "cif": dict(model_type="cif", ctc_weight=0.5, cif_quantity_weight=1.0),
    "transducer": dict(model_type="transducer", ctc_weight=0.3,
                       num_pred_layers=1, d_joint=16),
    "conformer": dict(model_type="hybrid", encoder_type="conformer",
                      ctc_weight=0.3, conv_kernel=7),
}


def tiny_cfg(family):
    return ModelConfig(vocab_size=16, d_input=8, d_model=16, d_inner=32,
                       num_heads=2, num_enc_layers=1, num_dec_layers=1,
                       dropout=0.0, **FAMILIES[family])


def make_batch(rng, b=8, t=37, u=5):
    targets = np.full((b, u), IGNORE_ID, np.int32)
    tl = np.zeros(b, np.int32)
    for i in range(b):
        n = int(rng.integers(2, u + 1))
        targets[i, :n] = rng.integers(2, 14, n)
        tl[i] = n
    return {
        "feats": jnp.asarray(
            rng.standard_normal((b, t, 8)).astype(np.float32)),
        "feat_lengths": jnp.asarray(np.full(b, t, np.int32)),
        "targets": jnp.asarray(targets),
        "target_lengths": jnp.asarray(tl),
    }


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_family_mesh_step_equals_single_device(family):
    from tpu_asr.parallel import make_mesh, replicated, shard_batch
    from tpu_asr.parallel.sharding import shard_params
    from tpu_asr.train import TrainState, make_optimizer, make_train_step
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"

    rng = np.random.default_rng(5)
    cfg = tiny_cfg(family)
    model = build_model(cfg)
    batch = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch["feats"],
                        batch["feat_lengths"], batch["targets"],
                        batch["target_lengths"])
    tx = make_optimizer(cfg.d_model, warmup_steps=10, k=5.0)
    state = TrainState.create(params["params"], tx, jax.random.PRNGKey(1))

    step = make_train_step(model, tx, donate=False)
    _, m1 = step(state, batch)

    @jax.jit
    def grads_of(params, batch):
        def loss_fn(p):
            out = model.apply({"params": p}, batch["feats"],
                              batch["feat_lengths"], batch["targets"],
                              batch["target_lengths"], deterministic=True)
            return out["loss"]
        return jax.grad(loss_fn)(params)

    g1 = jax.device_get(grads_of(state.params, batch))

    mesh = make_mesh(n_data=4, n_model=2)
    mstate = state.replace(
        params=shard_params(state.params, mesh),
        opt_state=jax.device_put(state.opt_state, replicated(mesh)),
        step=jax.device_put(state.step, replicated(mesh)),
        rng=jax.device_put(state.rng, replicated(mesh)))
    mbatch = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    _, m2 = step(mstate, mbatch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4, err_msg=family)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=2e-4,
                               err_msg=family)
    g2 = jax.device_get(grads_of(mstate.params, mbatch))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-3,
                                                err_msg=family), g1, g2)


@pytest.mark.parametrize("family,mode,beam_kw", [
    ("cif", "cif_greedy", dict(beam=1, max_len=12)),
    ("conformer", "greedy_ctc", dict(beam=1, max_len=12)),
    ("conformer", "joint", dict(beam=3, max_len=10, nbest=2,
                                ctc_weight=0.3)),
])
def test_family_mesh_decode_equals_single_device(family, mode, beam_kw):
    """Decode under a dp mesh is a layout change, not a numerical one —
    identical hypotheses and scores. (Transducer greedy/ALSD equality
    already pinned in test_transducer_model.py.)"""
    from tpu_asr.decode.beam import BeamConfig
    from tpu_asr.decode.recognizer import Recognizer
    from tpu_asr.parallel import make_mesh

    rng = np.random.default_rng(7)
    cfg = tiny_cfg(family)
    model = build_model(cfg)
    batch = make_batch(rng, b=4, t=64)
    params = model.init(jax.random.PRNGKey(0), batch["feats"],
                        batch["feat_lengths"], batch["targets"],
                        batch["target_lengths"])
    feats = np.asarray(batch["feats"])
    flens = np.asarray([64, 50, 41, 33], np.int32)
    dbatch = {"feats": feats, "feat_lengths": flens}

    beam = BeamConfig(**beam_kw)
    ref = Recognizer(cfg=cfg, params=params, mode=mode,
                     beam=beam).decode_batch_nbest(dbatch)
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    got = Recognizer(cfg=cfg, params=params, mode=mode, beam=beam,
                     mesh=mesh).decode_batch_nbest(dbatch)

    assert len(got) == len(ref) == 4
    for r, g in zip(ref, got):
        for hr, hg in zip(r, g):
            assert hg["yseq"] == hr["yseq"], (family, mode)
            np.testing.assert_allclose(hg["score"], hr["score"],
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"{family}/{mode}")
