"""Checkpointing: orbax-backed save/restore with hyperparam sidecar.

Reference: `Transformer.serialize`/`load_model` + Solver's per-epoch
`torch.save(epoch%d.pth.tar)`, best-by-cv-loss copy, and `--continue_from`
(SURVEY.md 3.3). Here: orbax CheckpointManager holds (params, opt state,
step, rng); the model config is a JSON sidecar so `load_model` can rebuild
the module without the training script's flags — same round-trip contract.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from tpu_asr.models.config import ModelConfig


def _config_to_json(cfg: ModelConfig) -> dict:
    d = dataclasses.asdict(cfg)
    d["dtype"] = np.dtype(cfg.dtype).name
    d["param_dtype"] = np.dtype(cfg.param_dtype).name
    return d


def _config_from_json(d: dict) -> ModelConfig:
    import jax.numpy as jnp
    d = dict(d)
    d["dtype"] = jnp.dtype(d["dtype"])
    d["param_dtype"] = jnp.dtype(d["param_dtype"])
    return ModelConfig(**d)


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        # the best-by-cv checkpoint is pinned against max_to_keep GC
        # (reference keeps its best .pth.tar copy forever); the closure
        # reads the current best at GC time.
        self._pinned_best = self._read_best_json_step()
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, best_fn=None,
                should_keep_fn=lambda step: step == self._pinned_best,
                # async saves overlap the next epoch on a single host;
                # multi-host uses the sync path (the async finalize
                # barrier hangs the 2-process CPU bring-up, and the
                # save/step overlap matters less than correctness there)
                enable_async_checkpointing=jax.process_count() == 1),
        )

    def _read_best_json_step(self):
        path = os.path.join(self.directory, "best.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)["step"]
        return None

    def save_config(self, cfg: ModelConfig) -> None:
        if jax.process_index() != 0:   # orbax coordinates the tensor save
            return                     # across processes; sidecars are
        with open(os.path.join(self.directory, "model_config.json"), "w") as f:
            json.dump(_config_to_json(cfg), f, indent=2)

    def load_config(self) -> ModelConfig:
        with open(os.path.join(self.directory, "model_config.json")) as f:
            return _config_from_json(json.load(f))

    def save_frontend(self, fcfg) -> None:
        """Frontend sidecar (frontend.json): feature extraction must match
        between train and decode — notably the CMVN policy (global stats
        path) — so decode CLIs pick it up from the checkpoint dir."""
        if jax.process_index() != 0:
            return
        d = dataclasses.asdict(fcfg)
        d["dtype"] = np.dtype(fcfg.dtype).name
        with open(os.path.join(self.directory, "frontend.json"), "w") as f:
            json.dump(d, f, indent=2)

    def load_frontend(self):
        """FrontendConfig from the sidecar; None if absent (old
        checkpoints — callers fall back to defaults)."""
        import jax.numpy as jnp

        from tpu_asr.frontend import FrontendConfig
        path = os.path.join(self.directory, "frontend.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            d = json.load(f)
        d["dtype"] = jnp.dtype(d["dtype"])
        return FrontendConfig(**d)

    def save(self, state, epoch: int = 0, cv_loss: float = 0.0,
             is_best: bool = False) -> None:
        step = int(state.step)
        # At most ONE save in flight: drain the previous async save before
        # starting the next. Orbax 0.11's internal blocking path can
        # double-finalize a backed-up save (observed on the 1-core box as
        # FileNotFoundError renaming <step>.orbax-checkpoint-tmp/meta at
        # finalize time, crashing a long TPU run mid-training). The save
        # still overlaps the NEXT epoch's compute; only the following
        # save() blocks.
        self.manager.wait_until_finished()
        meta = {"epoch": epoch, "cv_loss": float(cv_loss),
                "is_best": bool(is_best)}
        if is_best:
            self._pinned_best = step   # before save: GC runs at save time
        self.manager.save(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta)))
        if is_best and jax.process_index() == 0:
            with open(os.path.join(self.directory, "best.json"), "w") as f:
                json.dump({"step": step, **meta}, f)

    def wait(self):
        self.manager.wait_until_finished()

    def latest_step(self):
        return self.manager.latest_step()

    def best_step(self):
        best = self._read_best_json_step()
        if best is not None and best in (self.manager.all_steps() or []):
            return best
        # best.json from an older run whose step was GC'd: fall back
        return self.latest_step()

    def restore(self, abstract_state, step: int | None = None):
        """Restore into the structure of `abstract_state` (a TrainState with
        correctly-shaped arrays, e.g. freshly initialized)."""
        step = step if step is not None else self.latest_step()
        restored = self.manager.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                meta=ocp.args.JsonRestore()))
        return restored["state"], restored["meta"]
