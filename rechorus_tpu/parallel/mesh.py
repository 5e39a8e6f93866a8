"""Device mesh + sharding rules.

The reference is single-device (SURVEY.md §2: no distributed code of any
kind); this module is the TPU-native scaling layer it lacks:

  * global Mesh over ('data', 'model') axes;
  * embedding tables (the memory-dominant state in recsys) row-sharded
    over 'model' -- the recsys analog of TP/EP; XLA GSPMD inserts the
    all-to-all/all-gather for cross-shard id lookup;
  * everything else replicated; activations/batches sharded over 'data'
    (gradients psum over 'data' automatically under jit).

Row-count divisibility: real tables are (n_items + 1)-row (1-based ids
plus pad row 0), which rarely divides the 'model' axis. Two mechanisms
cooperate:

  1. `set_table_row_pad(m)` -- called before model init -- makes every
     table built through ops.layers.embed round its row count up to a
     multiple of m. Dead rows are invisible to the model (ids are always
     < the logical row count; every consumer gathers by id, never scans
     the raw table), so this only costs a sliver of HBM.
  2. `param_spec` still checks divisibility and falls back to
     replication (with a logged warning) for any table that slipped
     through -- e.g. `self.param` tables with hand-set shapes.
"""
from __future__ import annotations

import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# Embedding tables smaller than this stay replicated (sharding overhead
# would dominate); row-sharding kicks in for production-size catalogs.
MIN_ROWS_TO_SHARD = 1024

# Row-count quantum for tables built via ops.layers.embed; set to the
# mesh 'model'-axis size before model init so row-sharding divides.
_TABLE_ROW_PAD = 1


def set_table_row_pad(m: int) -> None:
    """Round embedding-table row counts up to a multiple of m (>= 1).

    Must be called BEFORE model.init -- flax materializes table shapes at
    trace time. Checkpoints written with a different pad are reconciled
    row-wise by BaseRunner.load_model.
    """
    global _TABLE_ROW_PAD
    _TABLE_ROW_PAD = max(1, int(m))


def get_table_row_pad() -> int:
    return _TABLE_ROW_PAD


def pad_rows(num: int) -> int:
    """Logical row count -> physical row count under the current pad."""
    m = _TABLE_ROW_PAD
    return ((num + m - 1) // m) * m


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


def param_spec(path: tuple, value, model_size: int = 1) -> P:
    """Sharding rule: 2-D 'embedding' tables row-shard over 'model'.

    Tables whose row count does not divide the 'model' axis fall back to
    replication with a warning (pad via set_table_row_pad to avoid)."""
    names = [str(p) for p in path]
    is_table = any("embedding" in n.lower() for n in names) and value.ndim == 2
    if is_table and value.shape[0] >= MIN_ROWS_TO_SHARD:
        if model_size > 1 and value.shape[0] % model_size != 0:
            logging.warning(
                "Table %s rows=%d not divisible by model axis %d; replicating "
                "(call set_table_row_pad(%d) before model init to shard it)",
                "/".join(names), value.shape[0], model_size, model_size,
            )
            return P()
        return P("model", None)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh under the sharding rules."""
    m = mesh.shape.get("model", 1)

    def place(path, v):
        spec = param_spec(tuple(p.key for p in path), v, model_size=m)
        return global_put(v, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_state(state, tx, mesh: Mesh):
    """Place a fresh TrainState on the mesh: params under the sharding
    rules, optimizer moments re-initialized FROM the sharded params (so
    zeros_like inherits each param's sharding -- Adam mu/nu live next to
    their rows), everything else replicated."""
    params = shard_params(state.params, mesh)
    opt_state = tx.init(params)
    rep = replicated(mesh)
    extra = jax.tree.map(
        lambda x: global_put(x, rep) if hasattr(x, "shape") else x, state.extra_vars
    )
    return state.replace(params=params, opt_state=opt_state, extra_vars=extra)


def global_put(x, sharding: NamedSharding):
    """device_put that also works multi-host: every process holds the
    same full host array (identically-seeded), and each serves only its
    addressable shards -- batch sharding with zero communication."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard their leading axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def index_matrix_sharding(mesh: Mesh) -> NamedSharding:
    """The per-epoch [n_batches, B] index matrix: the scan axis (0) stays
    whole, each step's batch (1) shards over 'data'."""
    return NamedSharding(mesh, P(None, "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
