"""Train layer: Noam schedule formula, train step mechanics, checkpoint
round-trip, 8-device data-parallel step on the virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_asr import IGNORE_ID
from tpu_asr.models import ModelConfig, Transformer
from tpu_asr.train import (TrainState, make_eval_step, make_optimizer,
                           make_train_step, noam_schedule)

CFG = ModelConfig(vocab_size=16, d_input=8, d_model=16, d_inner=32,
                  num_heads=2, num_enc_layers=1, num_dec_layers=1,
                  dropout=0.0, model_type="hybrid")


def _batch(rng, b=4, t=37, u=5):
    targets = np.full((b, u), IGNORE_ID, np.int32)
    tl = np.zeros(b, np.int32)
    for i in range(b):
        n = int(rng.integers(2, u + 1))
        targets[i, :n] = rng.integers(2, 14, n)
        tl[i] = n
    return {
        "feats": jnp.asarray(rng.standard_normal((b, t, 8)).astype(np.float32)),
        "feat_lengths": jnp.asarray(np.full(b, t, np.int32)),
        "targets": jnp.asarray(targets),
        "target_lengths": jnp.asarray(tl),
    }


def _init_state(rng, tx):
    batch = _batch(rng)
    model = Transformer(CFG)
    variables = model.init(jax.random.PRNGKey(0), batch["feats"],
                           batch["feat_lengths"], batch["targets"],
                           batch["target_lengths"])
    return model, TrainState.create(variables["params"], tx,
                                    jax.random.PRNGKey(1))


def test_noam_schedule_formula():
    d, w, k = 512, 4000, 1.0
    sched = noam_schedule(d, w, k)
    for step in [0, 10, 3999, 4000, 10000]:
        s = step + 1
        want = k * d ** -0.5 * min(s ** -0.5, s * w ** -1.5)
        np.testing.assert_allclose(float(sched(step)), want, rtol=1e-4)
    # peak at warmup boundary
    peak = float(sched(w - 1))
    assert peak >= float(sched(w // 2)) and peak >= float(sched(4 * w))


def test_train_step_reduces_loss(rng):
    tx = make_optimizer(CFG.d_model, warmup_steps=10, k=5.0)
    model, state = _init_state(rng, tx)
    step = make_train_step(model, tx, donate=False)
    batch = _batch(rng)
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_train_step_wav_mode(rng):
    """Wav-mode train step (on-device frontend inside the jitted step).
    Slow tier: a second full train-step compile; feat-mode keeps the
    fast-tier coverage and the frontend has its own unit tests."""
    from tpu_asr.frontend import FrontendConfig
    cfg = ModelConfig(**{**CFG.__dict__, "d_input": 80})
    fcfg = FrontendConfig()
    b = 2
    wav = jnp.asarray(rng.standard_normal((b, 8000)).astype(np.float32))
    batch = {
        "wav": wav, "wav_lengths": jnp.asarray([8000, 6000]),
        "targets": jnp.asarray(rng.integers(2, 14, (b, 4)).astype(np.int32)),
        "target_lengths": jnp.asarray([4, 4]),
    }
    from tpu_asr.frontend import wav_to_features
    feats, flens = wav_to_features(wav, batch["wav_lengths"], fcfg)
    model = Transformer(cfg)
    variables = model.init(jax.random.PRNGKey(0), feats, flens,
                           batch["targets"], batch["target_lengths"])
    tx = make_optimizer(cfg.d_model)
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, frontend=fcfg, donate=False)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_checkpoint_roundtrip(tmp_path, rng):
    from tpu_asr.train.checkpoints import Checkpointer
    tx = make_optimizer(CFG.d_model)
    model, state = _init_state(rng, tx)
    step = make_train_step(model, tx, donate=False)
    batch = _batch(rng)
    state, _ = step(state, batch)
    ck = Checkpointer(str(tmp_path / "ckpt"))
    ck.save_config(CFG)
    ck.save(state, epoch=0, cv_loss=1.5, is_best=True)
    ck.wait()
    cfg2 = ck.load_config()
    assert cfg2 == CFG
    _, fresh = _init_state(rng, tx)
    restored, meta = ck.restore(fresh)
    assert meta["epoch"] == 0 and abs(meta["cv_loss"] - 1.5) < 1e-9
    assert int(restored.step) == 1
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=0),
                 state.params, restored.params)


def test_best_checkpoint_survives_gc(tmp_path, rng):
    """The best-by-cv checkpoint must be pinned against max_to_keep GC
    (the reference keeps its best .pth.tar forever); recognize.py restores
    best_step() long after training moved on."""
    from tpu_asr.train.checkpoints import Checkpointer
    tx = make_optimizer(CFG.d_model)
    model, state = _init_state(rng, tx)
    ck = Checkpointer(str(tmp_path / "ckpt"), max_to_keep=2)
    cvs = [5.0, 1.0, 4.0, 3.9, 3.8, 3.7]          # best at step 1
    best = float("inf")
    for i, cv in enumerate(cvs):
        st = state.replace(step=jnp.asarray(i, jnp.int32))
        is_best = cv < best
        best = min(best, cv)
        ck.save(st, epoch=i, cv_loss=cv, is_best=is_best)
    ck.wait()
    assert ck.best_step() == 1
    restored, meta = ck.restore(state, step=ck.best_step())
    assert meta["is_best"] and abs(meta["cv_loss"] - 1.0) < 1e-9
    assert int(restored.step) == 1


def _check_mesh_step_equals_single_device(rng, mesh_shapes):
    """SPMD correctness, not just liveness: one train step on a dp x tp
    mesh must produce the SAME loss, grad norm, and updated params as the
    single-device step (f32 tolerance; reduction order differs across
    shardings). This is the actual claim of the sharding rules."""
    from tpu_asr.parallel import make_mesh, shard_batch, replicated
    from tpu_asr.parallel.sharding import shard_params
    tx = make_optimizer(CFG.d_model, warmup_steps=10, k=5.0)
    model, state = _init_state(rng, tx)
    batch = _batch(rng, b=8)

    step = make_train_step(model, tx, donate=False)
    s1, m1 = step(state, batch)

    @jax.jit
    def grads_of(params, batch):
        def loss_fn(p):
            out = model.apply({"params": p}, batch["feats"],
                              batch["feat_lengths"], batch["targets"],
                              batch["target_lengths"], deterministic=True)
            return out["loss"]
        return jax.grad(loss_fn)(params)

    g1 = jax.device_get(grads_of(state.params, batch))

    for n_data, n_model in mesh_shapes:
        mesh = make_mesh(n_data=n_data, n_model=n_model,
                         devices=jax.devices()[: n_data * n_model])
        mstate = state.replace(
            params=shard_params(state.params, mesh),
            opt_state=jax.device_put(state.opt_state, replicated(mesh)),
            step=jax.device_put(state.step, replicated(mesh)),
            rng=jax.device_put(state.rng, replicated(mesh)))
        mbatch = shard_batch({k: np.asarray(v) for k, v in batch.items()},
                             mesh)
        # same jit: shardings propagate from the placed args (GSPMD TP)
        s2, m2 = step(mstate, mbatch)

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=2e-4, err_msg=str((n_data, n_model)))
        np.testing.assert_allclose(float(m1["grad_norm"]),
                                   float(m2["grad_norm"]), rtol=2e-4,
                                   err_msg=str((n_data, n_model)))
        # FULL gradient-tree equality (post-Adam params are ill-conditioned
        # for this: near-zero grads flip sign under different reduction
        # orders and Adam turns that into +-lr)
        g2 = jax.device_get(grads_of(mstate.params, mbatch))
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                a, b, atol=1e-5, rtol=1e-3,
                err_msg=str((n_data, n_model))), g1, g2)


def test_mesh_step_equals_single_device(rng):
    # dp=4 x tp=2 exercises BOTH mesh axes in the fast tier; pure-dp is
    # the slow variant below (each extra mesh shape = two more compiles)
    _check_mesh_step_equals_single_device(rng, [(4, 2)])


@pytest.mark.slow
def test_mesh_step_equals_single_device_pure_dp(rng):
    _check_mesh_step_equals_single_device(rng, [(8, 1)])


def test_data_parallel_step_on_cpu_mesh(rng):
    from tpu_asr.parallel import make_mesh, shard_batch, replicated
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    mesh = make_mesh()
    tx = make_optimizer(CFG.d_model, warmup_steps=10, k=5.0)
    model, state = _init_state(rng, tx)
    step = make_train_step(model, tx, donate=False, mesh=mesh)
    batch = shard_batch({k: np.asarray(v) for k, v in
                         _batch(rng, b=8).items()}, mesh)
    state = jax.device_put(state, replicated(mesh))
    losses = []
    for _ in range(4):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # params remain replicated (one logical copy)
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def _accum_setup():
    from tpu_asr.models import ModelConfig as MC, Transformer as TF
    cfg = MC(vocab_size=16, d_input=80, d_model=32, d_inner=64,
             num_heads=2, num_enc_layers=1, num_dec_layers=1,
             dropout=0.0, model_type="ctc")
    model = TF(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((4, 60, 80)).astype(np.float32))
    flens = jnp.full((4,), 60, jnp.int32)
    ys = jnp.asarray(rng.integers(2, 14, (4, 5)).astype(np.int32))
    yls = jnp.full((4,), 5, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), feats, flens, ys, yls)
    return cfg, model, variables["params"], (feats, flens, ys, yls)


@pytest.mark.slow
def test_grad_accumulation_averaging_exact():
    """Half-batch grads average to the full-batch grad exactly (mean
    losses) — the numerical premise of optax.MultiSteps accumulation."""
    cfg, model, p0, (feats, flens, ys, yls) = _accum_setup()

    def grad(sl):
        def loss(p):
            return model.apply({"params": p}, feats[sl], flens[sl],
                               ys[sl], yls[sl])["loss"]
        return jax.grad(loss)(p0)

    g_full, g1, g2 = grad(slice(None)), grad(slice(0, 2)), grad(slice(2, 4))
    for a, b, c in zip(jax.tree.leaves(g1), jax.tree.leaves(g2),
                       jax.tree.leaves(g_full)):
        np.testing.assert_allclose(np.asarray((a + b) / 2), np.asarray(c),
                                   atol=1e-6)


def test_multisteps_equals_mean_grad_step():
    """optax-level equivalence on well-conditioned grads: MultiSteps over
    two micro-grads == one inner Adam/Noam step on their average.
    (Post-Adam params of the real model are NOT comparable here: the
    grad norm clip leaves near-zero-grad leaves whose step-1 update is
    lr*sign(float-eps noise) on any two execution paths.)"""
    import optax
    pw = {"w": jnp.asarray([1.0, -2.0, 0.5, 3.0])}
    ga = {"w": jnp.asarray([0.30, 0.11, -0.25, 0.40])}
    gb = {"w": jnp.asarray([0.50, -0.70, 0.45, 0.10])}
    ms = make_optimizer(32, warmup_steps=10, accum_steps=2)
    st = ms.init(pw)
    u1, st = ms.update(ga, st, pw)
    u2, st = ms.update(gb, st, pw)
    p_ms = optax.apply_updates(optax.apply_updates(pw, u1), u2)
    inner = make_optimizer(32, warmup_steps=10)
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2, ga, gb)
    u, _ = inner.update(g_mean, inner.init(pw), pw)
    p_direct = optax.apply_updates(pw, u)
    np.testing.assert_allclose(np.asarray(p_ms["w"]),
                               np.asarray(p_direct["w"]), atol=1e-7)


@pytest.mark.slow
def test_grad_accumulation_equals_big_batch():
    """MultiSteps wiring through the real train step: defers the update
    until the k-th micro-step, then applies one inner Adam/Noam step on
    the averaged grads. (Slow tier: compiles the full train step; the
    averaging exactness + optax semantics above stay in the fast tier.)"""
    cfg, model, p0, (feats, flens, ys, yls) = _accum_setup()

    def batch(sl):
        return {"feats": feats[sl], "feat_lengths": flens[sl],
                "targets": ys[sl], "target_lengths": yls[sl]}

    tx = make_optimizer(cfg.d_model, warmup_steps=10, accum_steps=2)
    s_acc = TrainState.create(p0, tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, donate=False)
    s_acc, _ = step(s_acc, batch(slice(0, 2)))

    def max_delta(p):
        return max(float(jnp.max(jnp.abs(a - b))) for a, b in
                   zip(jax.tree.leaves(p), jax.tree.leaves(p0)))

    assert max_delta(s_acc.params) == 0.0
    s_acc, _ = step(s_acc, batch(slice(2, 4)))
    assert max_delta(s_acc.params) > 1e-4    # the deferred update landed
