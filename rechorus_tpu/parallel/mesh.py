"""Device mesh + sharding rules.

The reference is single-device (SURVEY.md §2: no distributed code of any
kind); this module is the TPU-native scaling layer it lacks:

  * global Mesh over ('data', 'model') axes;
  * embedding tables (the memory-dominant state in recsys) row-sharded
    over 'model' -- the recsys analog of TP/EP; XLA GSPMD inserts the
    all-to-all/all-gather for cross-shard id lookup;
  * everything else replicated; activations/batches sharded over 'data'
    (gradients psum over 'data' automatically under jit).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# Embedding tables smaller than this stay replicated (sharding overhead
# would dominate); row-sharding kicks in for production-size catalogs.
MIN_ROWS_TO_SHARD = 1024


def make_mesh(n_devices: int | None = None, model_parallel: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if model_parallel is None:
        model_parallel = 2 if n % 2 == 0 and n >= 4 else 1
    data_parallel = n // model_parallel
    dev_array = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(dev_array, axis_names=("data", "model"))


def param_spec(path: tuple, value) -> P:
    """Sharding rule: 2-D 'embedding' tables row-shard over 'model'."""
    names = [str(p) for p in path]
    is_table = any("embedding" in n.lower() for n in names) and value.ndim == 2
    if is_table and value.shape[0] >= MIN_ROWS_TO_SHARD:
        return P("model", None)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh under the sharding rules."""

    def place(path, v):
        spec = param_spec(tuple(p.key for p in path), v)
        return jax.device_put(v, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard their leading axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
