"""Touched-rows-only ("lazy") Adam for embedding tables.

At production scale the optimizer sweep dominates training: a dense Adam
step on a 1M x 64 table reads grad+param+mu+nu and writes param+mu+nu --
~1.8 GB of HBM traffic per step for rows that are almost all untouched
(a 4096-batch touches <0.1% of rows). Lazy Adam updates ONLY the rows the
batch touched: gather their grad/mu/nu rows, run the Adam math on
[R, D], scatter back. Duplicate row ids are safe: the dense grad row
already aggregates every occurrence, so each duplicate computes the
identical update value and `.at[rows].set` writes it idempotently.

Semantics vs dense Adam (torch parity caveats -- this is why the lane is
flag-gated behind `--lazy_emb_adam`):
  * untouched rows skip the mu/nu decay ("ghost updates"). With l2=0 a
    never-touched row is bit-identical to dense Adam (0-moments decay to
    0, update is 0); a row touched at step t and not after diverges by
    the tail of its decaying momentum.
  * with l2>0, dense `add_decayed_weights` nudges every row every step;
    lazy applies the decay only to touched rows at their touch steps.
This matches tf.contrib LazyAdam / torch SparseAdam behavior.

The Adam math mirrors optax.adam exactly (m_hat/(sqrt(v_hat)+eps),
eps_root=0) so non-table leaves and fully-touched tables stay bit-equal
to the dense path; see tests/test_lazy_adam.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LazyAdamState(NamedTuple):
    count: jnp.ndarray  # shared Adam step for bias correction
    mu: dict
    nu: dict


class LazyAdamTx:
    """Duck-typed optimizer for the lazy path. `.init` matches the optax
    contract (so `parallel.mesh.shard_state` re-initializes moments with
    each param's sharding); updates go through `lazy_adam_step` instead
    of `.update` because they need the touched-row ids, which optax's
    update signature cannot carry."""

    def __init__(self, lr: float, l2: float, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8, decay_mask=None):
        self.lr, self.l2 = lr, l2
        self.b1, self.b2, self.eps = b1, b2, eps
        # pytree-of-bool (or callable) matching build_optimizer's
        # add_decayed_weights mask: which leaves receive l2
        self.decay_mask = decay_mask

    def init(self, params) -> LazyAdamState:
        # moments in f32 even for bf16-stored tables (--bf16_emb):
        # "f32 accumulation" -- the Adam math runs in f32 and only the
        # param write rounds to storage dtype
        def zeros(p):
            dt = jnp.float32 if p.dtype in (jnp.bfloat16, jnp.float16) else p.dtype
            # zeros_like (not zeros): inherits the param's sharding, which
            # parallel.mesh.shard_state depends on for the moments
            return jnp.zeros_like(p, dtype=dt)

        z = lambda tree: jax.tree.map(zeros, tree)
        return LazyAdamState(count=jnp.zeros((), jnp.int32), mu=z(params), nu=z(params))


def _leaf_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaf_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    if not path:
        return value
    out = dict(tree)
    out[path[0]] = _set(tree[path[0]], path[1:], value)
    return out


def lazy_adam_step(tx: LazyAdamTx, params, grads, state: LazyAdamState, rows_map):
    """One Adam step: leaves in `rows_map` ({param-path-tuple: 1-D int32
    row ids}) update touched rows only; every other leaf runs the exact
    dense optax.adam math (incl. l2 via decayed weights). Returns
    (new_params, new_state)."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - tx.b1 ** t
    bc2 = 1.0 - tx.b2 ** t

    decay_mask = tx.decay_mask
    if callable(decay_mask):
        decay_mask = decay_mask(params)

    new_params, new_mu, new_nu = params, state.mu, state.nu
    lazy_paths = set(rows_map.keys())
    for path, p in _leaf_paths(params):
        g = _get(grads, path)
        m, v = _get(state.mu, path), _get(state.nu, path)
        decay = tx.l2 if (tx.l2 > 0 and (decay_mask is None or _get(decay_mask, path))) else 0.0
        if path in lazy_paths:
            rows = rows_map[path].astype(jnp.int32).ravel()
            pr = p[rows].astype(jnp.float32)   # f32 math; storage may be bf16
            gr = g[rows].astype(jnp.float32)
            if decay:
                gr = gr + decay * pr
            mr = tx.b1 * m[rows] + (1.0 - tx.b1) * gr
            vr = tx.b2 * v[rows] + (1.0 - tx.b2) * gr * gr
            upd = tx.lr * (mr / bc1) / (jnp.sqrt(vr / bc2) + tx.eps)
            new_params = _set(new_params, path, p.at[rows].set((pr - upd).astype(p.dtype)))
            new_mu = _set(new_mu, path, m.at[rows].set(mr))
            new_nu = _set(new_nu, path, v.at[rows].set(vr))
        else:
            gf = g.astype(jnp.float32)
            if decay:
                gf = gf + decay * p.astype(jnp.float32)
            m2 = tx.b1 * m + (1.0 - tx.b1) * gf
            v2 = tx.b2 * v + (1.0 - tx.b2) * gf * gf
            upd = tx.lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + tx.eps)
            new_params = _set(new_params, path, (p.astype(jnp.float32) - upd).astype(p.dtype))
            new_mu = _set(new_mu, path, m2)
            new_nu = _set(new_nu, path, v2)
    return new_params, LazyAdamState(count=count, mu=new_mu, nu=new_nu)


def unique_rows(ids: jnp.ndarray, num_rows: int):
    """Static-size sorted unique for the sparse-grad lane.

    Returns (rows_sorted [R], scatter_rows [R]): rows_sorted is the
    sorted unique ids padded at the tail with `num_rows - 1` (>= every
    valid id, so the array stays globally sorted for searchsorted);
    scatter_rows equals rows_sorted on real slots and `num_rows` (out of
    range) on pad slots, so `.at[scatter_rows].set(..., mode='drop')`
    updates each touched row exactly once and skips the padding. A
    genuinely-touched `num_rows - 1` row sits in the sorted region with
    count > 0; its pad duplicates are dropped.

    Strategy: ONE value-only lax.sort + first-occurrence compaction.
    jnp.unique(return_counts=True) sorts with an iota payload ([B, 2]
    carry in the round-3 trace) plus count machinery; the dedup only
    needs the sorted values. (A dense-bitmap + prefix-sum variant was
    measured 3.5x WORSE at 1M rows -- XLA's O(num_rows) cumsum/scatter
    passes lose to the O(B log B) sort -- so sort it is.)"""
    ids = ids.astype(jnp.int32).ravel()
    out_size = ids.shape[0]
    s = jax.lax.sort(ids)
    first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    slot = jnp.cumsum(first.astype(jnp.int32)) - 1  # [B] slot per first occurrence
    target = jnp.where(first, slot, out_size)
    rows = jnp.full((out_size,), num_rows - 1, jnp.int32).at[target].set(s, mode="drop")
    scatter = jnp.full((out_size,), num_rows, jnp.int32).at[target].set(s, mode="drop")
    return rows, scatter


def unique_rows_hashed(ids: jnp.ndarray, num_rows: int):
    """Sort-free dedup for the sparse lane: scatter each occurrence's
    position into a dense [num_rows] map and let the LAST writer win --
    any single winner per id is a valid slot assignment, and XLA's
    duplicate-index .set picks exactly one. Returns
    (rows [R], scatter_rows [R], pos_map [num_rows]):

      * rows[j] = the id if position j won its id's slot, else
        num_rows - 1 (a valid row for the vals gather; never written);
      * scatter_rows[j] = the id on winner slots, num_rows (dropped by
        mode='drop') elsewhere -- each touched row written exactly once;
      * pos_map[id] = winning slot for touched ids, R (out of range for
        vals -> fallback) for untouched ids: the TableEmbed lookup map.

    Replaces the lax.sort path (unique_rows): a [8192] 1-D sort measured
    1.2 ms/step on v5e -- the dense-map build (one 4 MB memset + one
    scalar scatter + one gather) is ~50 us. Unlike unique_rows, `rows`
    is NOT sorted; every consumer must use pos_map (not searchsorted).
    Grad aggregation is unchanged: all occurrences of an id map to the
    one winner slot, so its cotangent accumulates there and loser slots
    receive zero cotangent and are dropped at scatter time."""
    ids = ids.astype(jnp.int32).ravel()
    R = ids.shape[0]
    iota = jnp.arange(R, dtype=jnp.int32)
    pos_map = jnp.full((num_rows,), R, jnp.int32).at[ids].set(iota)
    win = pos_map[ids] == iota
    rows = jnp.where(win, ids, num_rows - 1)
    scatter = jnp.where(win, ids, num_rows)
    return rows, scatter, pos_map


def row_pos_map(rows_sorted, scatter_rows, num_rows: int):
    """Dense id -> slot map for the sparse-lookup context: map[id] = its
    slot in rows_sorted, `out_size` (out of range for vals) for untouched
    ids. One [num_rows] broadcast + one [R] scatter per table per step
    buys O(1) lookups -- TableEmbed's previous searchsorted_unrolled was
    ~log2(R) SEQUENTIALLY DEPENDENT gather levels per covered feed gather
    (PERF.md r4 target #3: ~0.5 ms/step of id machinery at 1M items)."""
    out_size = rows_sorted.shape[0]
    return jnp.full((num_rows,), out_size, jnp.int32).at[scatter_rows].set(
        jnp.arange(out_size, dtype=jnp.int32), mode="drop")


def sparse_rows_and_vals(params, rows_map):
    """For each lazy table: unique-ify the touched ids and gather their
    current values (f32 compute even for bf16 storage). Returns
    (rows_info {path: (rows_sorted, scatter_rows)}, vals {path: [R, D]})."""
    rows_info, vals = {}, {}
    for path, ids in rows_map.items():
        p = _get(params, path)
        rows, scatter, pos_map = unique_rows_hashed(ids, p.shape[0])
        rows_info[path] = (rows, scatter, pos_map)
        vals[path] = p[rows].astype(jnp.float32)
    return rows_info, vals


def split_params(params, lazy_paths):
    """Remove the lazy table leaves from the param tree (so jax.grad
    never builds their dense cotangents). Returns (rest, reassemble)
    where reassemble(rest) splices the original leaves back in for
    model.apply -- they carry no gradient (the sparse lookup context
    routes every covered gather through the [R, D] vals instead)."""
    frozen = {path: _get(params, path) for path in lazy_paths}
    rest = params
    for path in lazy_paths:
        rest = _del(rest, path)

    def reassemble(rest_tree):
        full = rest_tree
        for path, leaf in frozen.items():
            full = _set_create(full, path, leaf)
        return full

    return rest, reassemble


def _del(tree, path):
    out = dict(tree)
    if len(path) == 1:
        del out[path[0]]
    else:
        out[path[0]] = _del(tree[path[0]], path[1:])
    return out


def _set_create(tree, path, value):
    if not path:
        return value
    out = dict(tree) if isinstance(tree, dict) else {}
    out[path[0]] = _set_create(out.get(path[0], {}), path[1:], value)
    return out


def lazy_adam_sparse_step(tx: LazyAdamTx, params, state: LazyAdamState,
                          rows_info, vals, g_vals, g_rest):
    """Adam step for the sparse-grad lane: lazy tables update from their
    [R, D] row gradients (`g_vals`, the cotangent of the gathered rows --
    already aggregated across duplicate ids by the lookup's backward
    pass); every other leaf runs the exact dense optax.adam math on
    `g_rest`. The dense table is only ever touched by O(R) gathers and
    mode='drop' scatters -- no [N, D] traffic."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - tx.b1 ** t
    bc2 = 1.0 - tx.b2 ** t

    decay_mask = tx.decay_mask
    if callable(decay_mask):
        decay_mask = decay_mask(params)

    new_params, new_mu, new_nu = params, state.mu, state.nu
    for path in rows_info:
        rows, scatter = rows_info[path][:2]
        p = _get(params, path)
        m, v = _get(state.mu, path), _get(state.nu, path)
        decay = tx.l2 if (tx.l2 > 0 and (decay_mask is None or _get(decay_mask, path))) else 0.0
        pr = vals[path]                       # [R, D] f32 (pre-update rows)
        gr = g_vals[path].astype(jnp.float32)
        if decay:
            gr = gr + decay * pr
        mr = tx.b1 * m[rows] + (1.0 - tx.b1) * gr
        vr = tx.b2 * v[rows] + (1.0 - tx.b2) * gr * gr
        upd = tx.lr * (mr / bc1) / (jnp.sqrt(vr / bc2) + tx.eps)
        new_params = _set(new_params, path,
                          p.at[scatter].set((pr - upd).astype(p.dtype), mode="drop"))
        new_mu = _set(new_mu, path, m.at[scatter].set(mr, mode="drop"))
        new_nu = _set(new_nu, path, v.at[scatter].set(vr, mode="drop"))

    for path, g in _leaf_paths(g_rest):
        p = _get(params, path)
        m, v = _get(state.mu, path), _get(state.nu, path)
        decay = tx.l2 if (tx.l2 > 0 and (decay_mask is None or _get(decay_mask, path))) else 0.0
        gf = g.astype(jnp.float32)
        if decay:
            gf = gf + decay * p.astype(jnp.float32)
        m2 = tx.b1 * m + (1.0 - tx.b1) * gf
        v2 = tx.b2 * v + (1.0 - tx.b2) * gf * gf
        upd = tx.lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + tx.eps)
        new_params = _set(new_params, path, (p.astype(jnp.float32) - upd).astype(p.dtype))
        new_mu = _set(new_mu, path, m2)
        new_nu = _set(new_nu, path, v2)
    return new_params, LazyAdamState(count=count, mu=new_mu, nu=new_nu)


def pack_lazy_leaves(params, state: LazyAdamState, paths):
    """Epoch-scan carry layout for the sparse-grad lane: concat
    [p | mu | nu] -> ONE [N, 3D] f32 leaf per lazy table (replacing the
    param leaf; mu/nu get 0-size placeholders so the carry keeps the
    LazyAdamState pytree structure). Rationale (docs/PERF.md): XLA's TPU
    row scatter costs ~73 ns/row + ~0.3 ms fixed REGARDLESS of row
    width, so fusing the three per-table scatters (param, mu, nu) into
    one [R, 3D] scatter cuts the optimizer's table traffic 3x. Packing
    happens INSIDE the jitted epoch (pack before the scan, unpack
    after), so checkpoints, eval, sharding specs and the external state
    layout never see the packed form. bf16 tables ride the epoch in f32
    and round once at unpack (documented deviation: strictly MORE
    precise than rounding every step)."""
    dtypes = {}
    mu, nu = state.mu, state.nu
    for path in paths:
        p = _get(params, path)
        dtypes[path] = p.dtype
        packed = jnp.concatenate(
            [p.astype(jnp.float32), _get(mu, path), _get(nu, path)], axis=1)
        params = _set(params, path, packed)
        mu = _set(mu, path, jnp.zeros((0,), jnp.float32))
        nu = _set(nu, path, jnp.zeros((0,), jnp.float32))
    return params, LazyAdamState(state.count, mu, nu), dtypes


def unpack_lazy_leaves(params, state: LazyAdamState, dtypes):
    """Inverse of pack_lazy_leaves (runs after the epoch scan, same jit)."""
    mu, nu = state.mu, state.nu
    for path, dt in dtypes.items():
        packed = _get(params, path)
        d = packed.shape[1] // 3
        params = _set(params, path, packed[:, :d].astype(dt))
        mu = _set(mu, path, packed[:, d:2 * d])
        nu = _set(nu, path, packed[:, 2 * d:])
    return params, LazyAdamState(state.count, mu, nu)


def packed_rows_and_vals(params, rows_map):
    """Packed-carry analogue of sparse_rows_and_vals: ONE [R, 3D] row
    gather per table serves the forward pass (param lanes) AND the
    optimizer (moment lanes). Returns (rows_info, gathered {path:
    [R, 3D]}, vals {path: [R, D] param lanes})."""
    rows_info, gathered, vals = {}, {}, {}
    for path, ids in rows_map.items():
        packed = _get(params, path)
        rows, scatter, pos_map = unique_rows_hashed(ids, packed.shape[0])
        rows_info[path] = (rows, scatter, pos_map)
        g = packed[rows]
        gathered[path] = g
        vals[path] = g[:, : packed.shape[1] // 3]
    return rows_info, gathered, vals


def lazy_adam_sparse_step_packed(tx: LazyAdamTx, params, state: LazyAdamState,
                                 rows_info, gathered, g_vals, g_rest):
    """lazy_adam_sparse_step on the packed [p | mu | nu] carry: the Adam
    math is identical (same op order per lane -> bit-equal to the
    unpacked lane in f32), but each table commits with ONE [R, 3D]
    mode='drop' scatter instead of three."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - tx.b1 ** t
    bc2 = 1.0 - tx.b2 ** t

    decay_mask = tx.decay_mask
    if callable(decay_mask):
        decay_mask = decay_mask(params)

    new_params = params
    for path in rows_info:
        rows, scatter = rows_info[path][:2]
        packed = _get(params, path)
        d = packed.shape[1] // 3
        g = gathered[path]
        pr, m, v = g[:, :d], g[:, d:2 * d], g[:, 2 * d:]
        decay = tx.l2 if (tx.l2 > 0 and (decay_mask is None or _get(decay_mask, path))) else 0.0
        gr = g_vals[path].astype(jnp.float32)
        if decay:
            gr = gr + decay * pr
        mr = tx.b1 * m + (1.0 - tx.b1) * gr
        vr = tx.b2 * v + (1.0 - tx.b2) * gr * gr
        upd = tx.lr * (mr / bc1) / (jnp.sqrt(vr / bc2) + tx.eps)
        block = jnp.concatenate([pr - upd, mr, vr], axis=1)
        new_params = _set(new_params, path,
                          packed.at[scatter].set(block, mode="drop"))

    new_mu, new_nu = state.mu, state.nu
    for path, g in _leaf_paths(g_rest):
        p = _get(params, path)
        m, v = _get(state.mu, path), _get(state.nu, path)
        decay = tx.l2 if (tx.l2 > 0 and (decay_mask is None or _get(decay_mask, path))) else 0.0
        gf = g.astype(jnp.float32)
        if decay:
            gf = gf + decay * p.astype(jnp.float32)
        m2 = tx.b1 * m + (1.0 - tx.b1) * gf
        v2 = tx.b2 * v + (1.0 - tx.b2) * gf * gf
        upd = tx.lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + tx.eps)
        new_params = _set(new_params, path, (p.astype(jnp.float32) - upd).astype(p.dtype))
        new_mu = _set(new_mu, path, m2)
        new_nu = _set(new_nu, path, v2)
    return new_params, LazyAdamState(count=count, mu=new_mu, nu=new_nu)


def resolve_lazy_rows(specs: dict, params, feed) -> dict:
    """{path: feed-key tuple} -> {path: concatenated id array}, keeping
    only paths that exist in this model's param tree and keys present in
    this feed (models share base-class specs; both can vary)."""
    out = {}
    for path, feed_keys in specs.items():
        try:
            _get(params, path)
        except (KeyError, TypeError):
            continue
        cols = [feed[k].ravel() for k in feed_keys if k in feed]
        if cols:
            out[path] = jnp.concatenate(cols) if len(cols) > 1 else cols[0]
    return out
