"""Parameter sharding rules: optional tensor parallelism over 'model'.

The reference has no TP (SURVEY.md 2.3); in JAX it is a set of
PartitionSpecs. Rules (by param path):
  attention q/k/v DenseGeneral kernel [d_model, H, dh]  -> shard H
  attention out_proj kernel          [H, dh, d_model]   -> shard H
  FFN w_1 kernel                     [d_model, d_inner] -> shard d_inner
  FFN w_2 kernel                     [d_inner, d_model] -> shard d_inner
Everything else replicated. XLA GSPMD inserts the collectives; with
model=1 this degrades to pure DP.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple, leaf) -> P:
    keys = [getattr(k, "key", str(k)) for k in path]
    name = "/".join(keys)
    if leaf.ndim == 0:
        return P()
    if "q_proj" in name or "k_proj" in name or "v_proj" in name:
        if keys[-1] == "kernel" and leaf.ndim == 3:
            return P(None, "model", None)
    if "out_proj" in name and keys[-1] == "kernel" and leaf.ndim == 3:
        return P("model", None, None)
    if ("w_1" in name or "w_2" in name) and keys[-1] == "kernel":
        if leaf.ndim == 2:
            # shard the d_inner axis: w_1 [d_model, d_inner], w_2 [d_inner, d_model]
            return P(None, "model") if "w_1" in name else P("model", None)
    return P()


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching `params` (TP over 'model')."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)),
        params)


def shard_params(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, NamedSharding(mesh, _spec_for(path, leaf))), params)
