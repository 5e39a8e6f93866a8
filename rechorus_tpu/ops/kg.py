"""Knowledge-graph kernels: triplet membership, relational time intervals,
and device-side KG negative sampling.

The reference stores the KG as a python set of (head, relation, tail)
tuples and probes it in per-row python loops (SLRCPlus.py:94-116,
Chorus.Dataset:198-255, CFKG.Dataset actions_before_epoch). TPU-first:
triplets are packed into int32 keys and membership is probed against a
host-built 2-choice cuckoo hash table -- two data-parallel gathers per
query, fully jittable -- so both the feed-time interval features and
the rejection negative sampling run inside the compiled step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_keys(heads, relations, tails, n_relations: int, n_entities: int):
    """key = (h * R + r) * E + t, unique per triplet."""
    h = np.asarray(heads, dtype=np.int64)
    r = np.asarray(relations, dtype=np.int64)
    t = np.asarray(tails, dtype=np.int64)
    return (h * n_relations + r) * n_entities + t


def sorted_triplet_keys(relation_df, n_relations: int, n_entities: int) -> np.ndarray:
    """Sorted unique packed triplet keys, HOST-side int64 (the device
    representation is the two-half cuckoo table below, which has no
    key-space limit until n_relations * n_entities overflows int32)."""
    keys = pack_keys(
        relation_df["head"].to_numpy(),
        relation_df["relation"].to_numpy(),
        relation_df["tail"].to_numpy(),
        n_relations,
        n_entities,
    )
    return np.sort(np.unique(keys))


def split_keys(h, r, t, n_relations: int, n_entities: int):
    """(hi, lo) int32 halves of a triplet key, computable in int32 on
    device (jax x64 is off): hi = head, lo = r * E + t. Valid while
    n_relations * n_entities < 2^31 -- e.g. 100M entities at R=20 --
    vs the single-int32 packing's R * E^2 bound that overflowed at
    ~15k entities."""
    if int(n_relations) * int(n_entities) >= 2 ** 31:
        raise ValueError(
            f"lo half n_relations*n_entities = {n_relations * n_entities} "
            "exceeds int32; re-index entities before packing")
    return h, r * n_entities + t


def searchsorted_unrolled(sorted_arr: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Left `searchsorted` as a STATICALLY UNROLLED binary search.

    jnp.searchsorted compiles to a sequential `while` scan on TPU --
    profiling (scripts/trace_ops.py) showed its log2(n)-step loops as
    ~12% of the KDA epoch (3 loops x 304 steps x 19 iterations over the
    373k-triplet set). Unrolling the fixed depth emits straight-line
    gathers XLA can fuse and pipeline."""
    n = sorted_arr.shape[0]
    lo = jnp.zeros(q.shape, jnp.int32)
    hi = jnp.full(q.shape, n, jnp.int32)
    # n+1 possible insertion positions -> ceil(log2(n+1)) halvings
    # (depth log2(n) is one short exactly when n is a power of two)
    depth = max(1, int(np.ceil(np.log2(n + 1))))
    for _ in range(depth):
        mid = (lo + hi) >> 1
        inside = lo < hi  # converged lanes must stop moving
        go_right = inside & (sorted_arr[jnp.clip(mid, 0, n - 1)] < q)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(inside & ~go_right, mid, hi)
    return lo


# 2-choice cuckoo hashing of the triplet keys: membership on device is
# TWO INDEPENDENT 2-wide gathers + compares instead of a ~19-level
# binary search whose gathers are sequentially dependent (each level
# waits on the previous one's loaded value). Keys are stored as their
# (hi, lo) int32 halves (split_keys) so the key space scales past the
# single-int32 bound -- table shape [cap, 2]. The table is built once on
# the host at corpus load (readers.KGReader.member_table) and cached.
_CUCKOO_M1 = np.uint32(0x9E3779B1)  # Knuth golden-ratio multiplier
_CUCKOO_M2 = np.uint32(0x85EBCA77)  # murmur3 finalizer constant (odd)
_CUCKOO_M3 = np.uint32(0xC2B2AE3D)  # murmur3 finalizer constant 2 (odd)
_EMPTY = np.int32(-1)               # key halves are always >= 0


def _host_slots(hi_u32: np.ndarray, lo_u32: np.ndarray, b: int, salt: int = 0):
    """The two candidate slots are INDEPENDENT hashes of (hi, lo) -- a
    shared 32-bit mix would make any two distinct keys with equal mix
    collide on BOTH slots at EVERY capacity (ADVICE r4: three such keys
    would turn build_member_table's grow loop into an unbounded hang).
    `salt` further re-randomizes both hashes per rebuild attempt so a
    failed eviction chain is reassigned, not replayed."""
    s = np.uint32(np.uint64(salt) * np.uint64(0x9E3779B1) & np.uint64(0xFFFFFFFF))
    with np.errstate(over="ignore"):
        mix1 = (lo_u32 ^ s) * _CUCKOO_M1 ^ hi_u32 * _CUCKOO_M3
        mix2 = (hi_u32 ^ s) * _CUCKOO_M2 ^ lo_u32 * _CUCKOO_M3
        s1 = (mix1 * _CUCKOO_M1) >> np.uint32(32 - b)
        s2 = (mix2 * _CUCKOO_M2) >> np.uint32(32 - b)
    return s1.astype(np.int64), s2.astype(np.int64)


def _try_build(table: np.ndarray, hi: np.ndarray, lo: np.ndarray, b: int,
               salt: int = 0, max_kicks: int = 500) -> bool:
    s1, s2 = _host_slots(hi.astype(np.uint32), lo.astype(np.uint32), b, salt)
    # vectorized first pass: the first claimant of each s1 slot wins
    order = np.argsort(s1, kind="stable")
    first = np.ones(len(hi), bool)
    first[1:] = s1[order][1:] != s1[order][:-1]
    winners = order[first]
    table[s1[winners], 0] = hi[winners]
    table[s1[winners], 1] = lo[winners]
    # standard cuckoo eviction chains for the remainder (~collision tail)
    for idx in order[~first]:
        kh, kl = int(hi[idx]), int(lo[idx])
        slot = int(s2[idx])
        for _ in range(max_kicks):
            ch, cl = int(table[slot, 0]), int(table[slot, 1])
            table[slot, 0], table[slot, 1] = kh, kl
            if cl == int(_EMPTY):
                break
            kh, kl = ch, cl
            a1, a2 = _host_slots(np.uint32(kh), np.uint32(kl), b, salt)
            slot = int(a2) if slot == int(a1) else int(a1)
        else:
            return False
    return True


_MAX_TABLE_BITS = 30       # 2^30 slots = 8 GB host table: past any real KG
_SALTS_PER_CAPACITY = 8    # rebuild attempts before growing the table


def build_member_table(heads, relations, tails, n_relations: int,
                       n_entities: int) -> np.ndarray:
    """Host-side build of the cuckoo membership table -> int32
    [1 + cap, 2]: row 0 is a HEADER (salt, 0) and rows 1..cap the slots
    (cap a power of two, load factor <= 0.5, empty slots = (-1, -1)).
    On insertion failure the build first retries with a fresh salt
    (re-randomizing BOTH slot hashes, so eviction chains are reassigned
    rather than replayed), then grows; capacity is capped so a
    pathological key set errors out instead of looping forever
    (ADVICE r4)."""
    h = np.asarray(heads, dtype=np.int64)
    r = np.asarray(relations, dtype=np.int64)
    t = np.asarray(tails, dtype=np.int64)
    hi, lo = split_keys(h, r, t, n_relations, n_entities)
    uniq = np.unique(np.stack([hi, lo], axis=1), axis=0) if len(hi) else \
        np.zeros((0, 2), np.int64)
    hi, lo = uniq[:, 0].astype(np.int32), uniq[:, 1].astype(np.int32)
    n = max(1, len(hi))
    b = max(4, int(np.ceil(np.log2(n * 2))))
    while b <= _MAX_TABLE_BITS:
        for salt in range(_SALTS_PER_CAPACITY):
            table = np.full((1 + (1 << b), 2), _EMPTY, np.int32)
            table[0] = (salt, 0)
            if _try_build(table[1:], hi, lo, b, salt):
                return table
        b += 1
    raise RuntimeError(
        f"cuckoo member table failed to build for {n} keys even at "
        f"2^{_MAX_TABLE_BITS} slots x {_SALTS_PER_CAPACITY} salts -- "
        "degenerate key set?")


def member_probe(table: jnp.ndarray, hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Membership of (hi, lo) key halves (any broadcast shape, int32 >= 0)
    in the cuckoo table: two data-parallel gathers, no sequential
    dependence. `table` is the [1 + 2^b, 2] header+slots layout from
    build_member_table; the build salt is read from the header row (a
    traced scalar -- stays on device)."""
    cap = table.shape[0] - 1
    b = int(np.log2(cap))
    if (1 << b) != cap:
        raise ValueError(
            f"member table has {table.shape[0]} rows; expected 1 header + "
            "2^b slots -- stale corpus cache? rerun with --regenerate 1")
    s = table[0, 0].astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
    hi_u = hi.astype(jnp.uint32)
    lo_u = lo.astype(jnp.uint32)
    mix1 = (lo_u ^ s) * jnp.uint32(_CUCKOO_M1) ^ hi_u * jnp.uint32(_CUCKOO_M3)
    mix2 = (hi_u ^ s) * jnp.uint32(_CUCKOO_M2) ^ lo_u * jnp.uint32(_CUCKOO_M3)
    s1 = ((mix1 * jnp.uint32(_CUCKOO_M1)) >> jnp.uint32(32 - b)).astype(jnp.int32)
    s2 = ((mix2 * jnp.uint32(_CUCKOO_M2)) >> jnp.uint32(32 - b)).astype(jnp.int32)
    hit1 = (table[1 + s1, 0] == hi) & (table[1 + s1, 1] == lo)
    hit2 = (table[1 + s2, 0] == hi) & (table[1 + s2, 1] == lo)
    return hit1 | hit2


def is_member(member_table: jnp.ndarray, h, r, t, n_relations: int, n_entities: int):
    """Vectorized membership of (h, r, t) in the triplet set.
    h/r/t broadcastable int arrays -> bool array of the broadcast shape.
    `member_table` is the [cap, 2] cuckoo table from build_member_table
    (NOT the sorted key array; see readers.KGReader.member_table)."""
    hi = h.astype(jnp.int32)
    lo = r.astype(jnp.int32) * n_entities + t.astype(jnp.int32)
    return member_probe(member_table, hi, lo)


def relational_intervals(
    history_items: jnp.ndarray,   # [B, H] int
    history_times: jnp.ndarray,   # [B, H] int
    now: jnp.ndarray,             # [B] int (target row time)
    item_ids: jnp.ndarray,        # [B, C] candidate items
    member_table: jnp.ndarray,    # cuckoo table (build_member_table)
    n_relations: int,             # R (index 0 = virtual self-relation)
    n_entities: int,
    time_scalar: float,
    include_repeat: bool,
    query_relations: int | None = None,  # probe r in 1..query_relations-1
                                         # (SLRC+/Chorus use item relations
                                         # only even when attr relations
                                         # are in the packed key set)
) -> jnp.ndarray:
    """[B, C, R] time since the MOST RECENT history interaction related to
    each candidate under each relation; -1 where none exists.

    Relation 0 is the re-consumption gap (history item == candidate) when
    include_repeat (SLRC+, reference SLRCPlus.py:99-105); Chorus leaves it
    at -1 (Chorus.py:231-239). Relations 1..R-1 probe the KG:
    (history_item, r, candidate) in triplet_set.
    """
    B, H = history_items.shape
    C = item_ids.shape[1]
    R = query_relations if query_relations is not None else n_relations
    valid = history_items > 0  # [B, H]

    r_range = jnp.arange(1, R, dtype=jnp.int32)  # [R-1]
    member = is_member(
        member_table,
        history_items[:, None, :, None],          # [B, 1, H, 1]
        r_range[None, None, None, :],              # [1, 1, 1, R-1]
        item_ids[:, :, None, None],                # [B, C, 1, 1]
        n_relations,
        n_entities,
    )  # [B, C, H, R-1]
    member = member & valid[:, None, :, None]

    if include_repeat:
        rep = (history_items[:, None, :] == item_ids[:, :, None]) & valid[:, None, :]
    else:
        rep = jnp.zeros((B, C, H), dtype=bool)
    member_all = jnp.concatenate([rep[:, :, :, None], member], axis=-1)  # [B, C, H, R]

    j = jnp.arange(H)
    last = jnp.max(jnp.where(member_all, j[None, None, :, None] + 1, 0), axis=2) - 1  # [B,C,R]
    ht = jnp.broadcast_to(history_times[:, None, :], (B, C, H))
    t_at = jnp.take_along_axis(ht, jnp.maximum(last, 0), axis=2)  # [B, C, R]
    interval = (now[:, None, None] - t_at).astype(jnp.float32) / time_scalar
    return jnp.where(last >= 0, interval, -1.0)


def sample_kg_negatives(
    key: jax.Array,
    heads: jnp.ndarray,      # [B] raw head ids
    relations: jnp.ndarray,  # [B]
    tails: jnp.ndarray,      # [B] raw tail ids
    member_table: jnp.ndarray,
    n_relations: int,
    n_entities: int,
    hi_tail: int,
    hi_head: int,
    rounds: int = 8,
):
    """Corrupted (neg_head, neg_tail) avoiding existing triplets
    (reference Chorus.Dataset.actions_before_epoch / CFKG relation>0 path):
    neg_tail ~ U[1, hi_tail) with (h, r, neg_tail) not in KG;
    neg_head ~ U[1, hi_head) with (neg_head, r, t) not in KG.
    """
    from rechorus_tpu.ops.sampling import first_accepted

    B = heads.shape[0]

    def resample(key, lo, hi, bad_fn):
        return first_accepted(
            key,
            lambda k: jax.random.randint(k, (B,), lo, hi, dtype=jnp.int32),
            bad_fn, rounds)

    k1, k2 = jax.random.split(key)
    neg_tails = resample(
        k1, 1, hi_tail,
        lambda c: is_member(member_table, heads, relations, c, n_relations, n_entities),
    )
    neg_heads = resample(
        k2, 1, hi_head,
        lambda c: is_member(member_table, c, relations, tails, n_relations, n_entities),
    )
    return neg_heads, neg_tails
