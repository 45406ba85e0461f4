"""Training loop: jit-compiled train/eval steps + the epoch-level Solver.

Reference: src/solver/solver.py `Solver` / `_run_one_epoch` — tr/cv phases,
per-batch forward/loss/backward/step, grad clip, periodic prints, per-epoch
checkpoints, best-by-cv-loss tracking, `continue_from` resume.

TPU redesign: the whole step (SpecAugment -> forward -> loss -> grads ->
optax update) is ONE jit-compiled function with donated state; batches are
padded to static bucket shapes so there is one executable per bucket; under
a device mesh the same step runs SPMD data-parallel (tpu_asr.parallel) —
gradients are combined by XLA collectives, not host code.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tpu_asr.augment import SpecAugmentConfig, spec_augment
from tpu_asr.frontend import (FrontendConfig, build_lfr_features, lfr_length,
                              wav_to_features)


def batch_features(batch, frontend: FrontendConfig | None):
    """Resolve a batch to (feats, feat_lengths): either precomputed features
    or the on-device frontend over raw waveforms (wav mode)."""
    if "wav" in batch:
        cfg = frontend or FrontendConfig()
        return wav_to_features(batch["wav"], batch["wav_lengths"], cfg)
    return batch["feats"], batch["feat_lengths"]


def apply_lfr(feats, feat_lengths, lfr: tuple[int, int]):
    """LFR stacking (reference build_LFR_features) for linear-input models."""
    m, n = lfr
    if (m, n) == (1, 1):
        return feats, feat_lengths
    return build_lfr_features(feats, m, n), lfr_length(feat_lengths, n)


def strip_host_fields(batch):
    return {k: v for k, v in batch.items() if k != "ids"}


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, params, tx, rng):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), rng=rng)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    specaug: SpecAugmentConfig | None = None,
    frontend: FrontendConfig | None = None,
    lfr: tuple[int, int] = (1, 1),
    donate: bool = True,
    mesh: jax.sharding.Mesh | None = None,
):
    """Build the jitted train step: (state, batch) -> (state, metrics).

    batch: dict with targets [B,U] / target_lengths [B] plus either
    feats [B,T,D] + feat_lengths [B] (precomputed) or wav [B,S] +
    wav_lengths [B] (on-device frontend) — statically shaped per bucket.
    """

    def step_fn(state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        rng_aug, rng_drop = jax.random.split(rng)
        feats, feat_lengths = batch_features(batch, frontend)
        if specaug is not None:
            feats = spec_augment(rng_aug, feats, feat_lengths, specaug)
        feats, feat_lengths = apply_lfr(feats, feat_lengths, lfr)

        def loss_fn(params):
            out = model.apply(
                {"params": params}, feats, feat_lengths,
                batch["targets"], batch["target_lengths"],
                deterministic=False, rngs={"dropout": rng_drop})
            return out["loss"], out

        grads, out = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in out.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    if mesh is not None:
        from tpu_asr.parallel.mesh import batch_sharding, replicated
        return jax.jit(step_fn,
                       in_shardings=(replicated(mesh), batch_sharding(mesh)),
                       out_shardings=(replicated(mesh), replicated(mesh)),
                       donate_argnums=donate_argnums)
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def make_eval_step(model, frontend: FrontendConfig | None = None,
                   lfr: tuple[int, int] = (1, 1),
                   mesh: jax.sharding.Mesh | None = None):
    def step_fn(params, batch):
        feats, feat_lengths = batch_features(batch, frontend)
        feats, feat_lengths = apply_lfr(feats, feat_lengths, lfr)
        out = model.apply(
            {"params": params}, feats, feat_lengths,
            batch["targets"], batch["target_lengths"], deterministic=True)
        return out

    if mesh is not None:
        from tpu_asr.parallel.mesh import batch_sharding, replicated
        return jax.jit(step_fn,
                       in_shardings=(replicated(mesh), batch_sharding(mesh)),
                       out_shardings=replicated(mesh))
    return jax.jit(step_fn)


@dataclasses.dataclass
class Solver:
    """Epoch-level driver (reference: Solver.train)."""
    model: Any
    tx: optax.GradientTransformation
    train_loader: Any            # iterable of batch dicts per epoch
    cv_loader: Any
    epochs: int = 30
    print_freq: int = 10
    specaug: SpecAugmentConfig | None = None
    frontend: FrontendConfig | None = None
    lfr: tuple = (1, 1)
    mesh: Any = None
    checkpointer: Any = None     # tpu_asr.train.checkpoints.Checkpointer
    metrics_writer: Any = None   # tpu_asr.train.metrics.MetricsWriter
    early_stop_patience: int = 0  # 0 = off
    start_epoch: int = 0          # set by resume (continue_from)
    profile_dir: str | None = None  # jax.profiler trace of steps 10..15
    half_lr: bool = False         # reference half_lr: halve lr on cv plateau
    tx_factory: Any = None        # lr_scale -> optax tx (required w/ half_lr)

    def train(self, state: TrainState) -> TrainState:
        lr_scale = 1.0
        train_step = make_train_step(self.model, self.tx, self.specaug,
                                     self.frontend, lfr=tuple(self.lfr),
                                     mesh=self.mesh)
        eval_step = make_eval_step(self.model, self.frontend,
                                   lfr=tuple(self.lfr), mesh=self.mesh)
        best_cv = float("inf")
        bad_epochs = 0
        # multi-host: the jitted step needs GLOBAL arrays, not numpy
        # (every process assembles the same batch; each contributes its
        # addressable shards). Single-process keeps the numpy fast path.
        if self.mesh is not None and jax.process_count() > 1:
            from tpu_asr.parallel.mesh import make_global_batch
            place = lambda b: make_global_batch(b, self.mesh)
        else:
            place = lambda b: b
        for epoch in range(self.start_epoch, self.epochs):
            t0 = time.time()
            n_batches = 0
            step_losses = []   # device scalars; read ONCE at epoch end —
            # a float() per step would sync the host to the device every
            # batch and defeat JAX async dispatch (the loader thread could
            # no longer hide behind step N+1's dispatch).
            for batch in self.train_loader:
                if self.profile_dir and epoch == self.start_epoch:
                    if n_batches == 10:
                        jax.profiler.start_trace(self.profile_dir)
                    elif n_batches == 15:
                        jax.tree.leaves(state.params)[0].block_until_ready()
                        jax.profiler.stop_trace()
                state, metrics = train_step(state, place(strip_host_fields(batch)))
                n_batches += 1
                if n_batches % self.print_freq == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    m.update(epoch=epoch, step=int(state.step),
                             phase="train",
                             steps_per_sec=n_batches / (time.time() - t0))
                    if self.metrics_writer:
                        self.metrics_writer.write(m)
                step_losses.append(metrics["loss"])
            tr_loss = (float(jnp.mean(jnp.stack(step_losses)))
                       if step_losses else 0.0)

            cv_losses = []
            for batch in self.cv_loader:
                out = eval_step(state.params, place(strip_host_fields(batch)))
                cv_losses.append(out["loss"])
            cv_loss = (float(jnp.mean(jnp.stack(cv_losses)))
                       if cv_losses else 0.0)
            if self.metrics_writer:
                self.metrics_writer.write(
                    dict(epoch=epoch, step=int(state.step), phase="cv",
                         loss=cv_loss, train_loss=tr_loss,
                         epoch_sec=time.time() - t0))
            is_best = cv_loss < best_cv
            best_cv = min(best_cv, cv_loss)
            if self.checkpointer:
                self.checkpointer.save(state, epoch=epoch, cv_loss=cv_loss,
                                       is_best=is_best)
            if not is_best and self.half_lr and self.tx_factory is not None:
                # reference Solver behavior [med]: halve the lr scale when
                # cv loss stops improving. Adam moments carry over (the
                # opt-state tree is lr-independent); the step recompiles.
                lr_scale *= 0.5
                new_tx = self.tx_factory(lr_scale)
                train_step = make_train_step(
                    self.model, new_tx, self.specaug, self.frontend,
                    lfr=tuple(self.lfr), mesh=self.mesh)
                if self.metrics_writer:
                    self.metrics_writer.write(
                        dict(epoch=epoch, event="half_lr",
                             lr_scale=lr_scale))
            if self.early_stop_patience:
                bad_epochs = 0 if is_best else bad_epochs + 1
                if bad_epochs >= self.early_stop_patience:
                    break
        return state
