"""Streaming full-catalog top-k and rank kernels for large catalogs.

The dense eval/serving path (`runners/base.py::_dense_catalog_scores`)
materializes the [B, N] score matrix. At production catalog sizes that
breaks down: B=4096 x N=1M fp32 is 16 GB -- over HBM -- and even where it
fits, `lax.top_k` over N columns is the bottleneck (a full sort-network
pass over every score). The two kernels here stream the catalog in tiles
so the full score matrix never exists, and cut the top-k work by a
bucket factor while staying EXACT:

`tiled_catalog_topk` -- hierarchical exact top-k:
  1. Per catalog tile: score  s = u @ tile.T (+ bias)  on the MXU, reduce
     to bucket maxes (buckets of `bucket` consecutive items), keep each
     tile's top `k+M` bucket maxes (M = clicked-exclusion width).
  2. Merge tiles' candidates -> global top `k+M` buckets.
  3. Gather ONLY the winning buckets' items ((k+M)*bucket per user),
     rescore them exactly, knock out clicked ids, final `top_k(k)`.

  Exactness: let v* be the k-th largest unmasked score. Every bucket
  containing a true top-k item has bucket-max >= v*. Buckets with
  max >= v* are (a) buckets whose max is itself a top-k unmasked item
  (<= k of them) or (b) buckets whose max is an excluded clicked item
  scoring >= v* (<= M of them, one per clicked id). So the top k+M
  buckets by max contain every true winner; rescoring their full
  contents recovers the exact top-k. (Ties at v* break by index, the
  same convention as `lax.top_k`.) This is the PartialReduce idea
  behind `lax.approx_max_k` plus the exact second pass it omits.

  Measured (1 chip, B=4096, D=64, top-100): catalog 100k exact
  30.6k -> 80k users/s; catalog 1M: OOM -> 19.5k users/s exact.

`tiled_catalog_ranks` -- streaming ground-truth rank (reference
  BaseRunner.py:244-251 + evaluate_method :51-78 semantics) for
  `--test_all`: per tile, count scores >= target score; subtract
  clicked/pad corrections via gathers. Never materializes [B, N]; the
  item table is read from HBM exactly once per batch.

Both handle: optional item bias, column-0 pad item, dead padded tail
rows (ids >= n_valid), clicked-row exclusion, and non-tile-divisible
catalogs (a separately-processed static tail chunk -- no table copy).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# route the dense paths through the tiled kernels at this table size
# (measured crossover, 1 chip, B=4096, D=64: tiled exact already wins at
# 16k items -- 137k vs 99k users/s -- and the gap widens with N)
MIN_ROWS_FOR_TILED = 16384
# Pallas-fused stage 1 (ops/pallas_topk.py): "auto" = TPU only (the
# interpret-mode fallback is far slower than the scan kernels on CPU),
# "on" = always (tests), "off" = never
PALLAS = "auto"
# the monolithic approx_max_k lane stays faster than per-tile approx
# (~180k users/s flat) until the [B, N] score matrix stops fitting; route
# dense-approx below this element count (f32: 2 GB), tiled-approx above
DENSE_APPROX_MAX_ELEMS = 1 << 29
DEFAULT_TILE = 131072
DEFAULT_BUCKET = 16


def _use_pallas() -> bool:
    if PALLAS == "off":
        return False
    if PALLAS == "on":
        return True
    return jax.default_backend() == "tpu"


def _tile_plan(n_rows: int, tile: int, bucket: int = 1):
    """(n_full_tiles, full_span, tail_rows, tile): static catalog tiling.
    `tile` is rounded down to a bucket multiple so every tile (and the
    tail chunk) starts on a bucket boundary -- bucket ids then map to
    item spans globally, not per-tile."""
    tile = min(tile, n_rows)
    if bucket > 1 and tile % bucket:
        tile = max(bucket, tile - tile % bucket)
    n_full = n_rows // tile
    return n_full, n_full * tile, n_rows - n_full * tile, tile


def _tile_scores(u, table, bias, start: int, rows: int, n_valid, col_offset=0):
    """[B, rows] scores for table[start:start+rows] with pad masking.

    `start`/`rows` are Python ints (static): the slice is a plain lax
    slice, not a gather. `col_offset` shifts LOCAL ids to GLOBAL ids for
    the masks (a tracer inside shard_map -- masks are elementwise, so
    that is fine)."""
    t = jax.lax.slice_in_dim(table, start, start + rows, axis=0)
    s = u @ t.T
    if bias is not None:
        s = s + jax.lax.slice_in_dim(bias, start, start + rows)[None, :]
    cols = col_offset + start + jnp.arange(rows)
    ok = cols > 0
    if n_valid is not None:
        ok = ok & (cols < n_valid)
    return jnp.where(ok[None, :], s, -jnp.inf)


def _bucket_max(s, bucket: int):
    """[B, rows] -> [B, ceil(rows/bucket)] max over buckets of `bucket`
    consecutive columns (-inf padded)."""
    B, rows = s.shape
    pad = (-rows) % bucket
    if pad:
        s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    return s.reshape(B, -1, bucket).max(-1)


# EXACT bucket selection: plain full-width `lax.top_k` below
# TWO_LEVEL_MIN_G, `two_level_bucket_select` (contiguous-member
# two-level, below) above it. The graveyard, all measured same-session
# at B=4096, kk=150 on the [4096, 62592] 1M-item bucket-max matrix
# (1 chip):
#   * direct lax.top_k: 144 ms (31 ms @ G=6250, 70 ms @ 16384) -- the
#     baseline that everything below tried and failed to beat;
#   * r3/r4 two-level fan-16 super-bucket select: 190 ms -- its
#     take_along_axis member-value gather is a ~12 ns/element scalar
#     row-gather, width-independent, and dominates at every width;
#   * verified-approx select (approx_max_k candidates + streaming
#     count verification + lax.cond exact fallback -- the containment
#     proof was sound): DEAD END on the fallback RATE. The misses of
#     approx_max_k's PartialReduce land inside the top kk uniformly, so
#     at recall_target 0.95/0.96 ~73% of ROWS failed verification and
#     at 0.97/0.98 ~42% (2x oversampling included) -- any failed row
#     trips the whole-batch cond, so the fallback fired ~always and the
#     lane paid approx + count + top_k. recall_target 0.99 verified
#     clean (0/4096 rows) but the approx call itself measured ~320 ms --
#     slower than the fallback it was avoiding.
# What actually moved the lane is stage 2: `group_table_for_rescore`
# turned the rescore's scattered row-gather (113 ms) into contiguous
# slice gathers (49 ms). See docs/PERF.md r5.
#
# Applying the same CONTIGUITY lesson back to the select (late r5)
# finally beat direct top_k at wide G: the r3/r4 two-level select's
# killer was its strided member-value gather; with members laid out as
# the minor axis of a [B, G/F, F] reshape the gather is kk contiguous
# F*4-byte slices per row, and the select drops to two narrow top_k
# calls. Measured same-session (B=4096, G=62592, kk=150):
# direct 143.7 ms vs fan-8 55.2 / fan-16 47.5 / fan-32 59.9 ms, ids
# bit-identical to direct at fan<=16 (fan-32 differed on ONE exact
# f32 value tie at the kk boundary -- scripts/serve_select_bench4.py).

# contiguous two-level select fan, by bucket-matrix width (measured
# B=4096, kk=150, same-session pairs: G=6272 direct 27.3 / fan-8 22.2 /
# fan-16 26.3 ms; G=62592 direct 143.7 / fan-8 55.2 / fan-16 47.5 /
# fan-32 59.9 ms -- narrow matrices want the smaller fan's cheaper
# member stage, wide ones the smaller super top_k)
TWO_LEVEL_FAN_WIDE = 16
TWO_LEVEL_FAN_NARROW = 8
TWO_LEVEL_WIDE_G = 32768
# route exact bucket select through the two-level path at/above this
# width; it wins at both measured widths (the 100k lane's G=6250 by
# ~19%, the 1M lane's G=62592 by 3x) and below ~6k buckets direct
# top_k is already cheap enough that the extra program is not worth
# the unmeasured risk
TWO_LEVEL_MIN_G = 6144


def _two_level_fan(G: int) -> int:
    return TWO_LEVEL_FAN_NARROW if G < TWO_LEVEL_WIDE_G else TWO_LEVEL_FAN_WIDE


def two_level_bucket_select(bm, kk: int, fan: int | None = None):
    """Exact top-kk (values, column ids) over a wide [B, G] bucket-max
    matrix via a CONTIGUOUS two-level select.

    Reshape [B, G] -> [B, S, F] (super-bucket s owns the F contiguous
    columns s*F..s*F+F-1), `top_k(kk)` over the [B, S] super maxes,
    gather the winners' member rows as [B, kk, F] minor-dim slices
    (contiguous -- the whole point; a strided layout here is the
    12 ns/element scalar gather that killed the r3/r4 two-level select),
    finish with `top_k(kk)` over the flattened [B, kk*F] members and map
    flat positions back to column ids.

    Exactness (same containment argument as `tiled_catalog_topk`'s): let
    v* be the kk-th largest column. #columns >= v* is kk (no ties), each
    lives in a super with max >= v*, so #supers with max >= v* <= kk and
    ALL are in the top-kk supers; the gathered member set therefore
    contains every column >= v* and the final top_k keeps them. On EXACT
    f32 value ties at the kk boundary the choice among tied columns may
    differ from `lax.top_k`'s lowest-index convention (members are
    ordered by super rank here) -- tied candidates have equal scores, so
    stage 2's rescored top-k values are unaffected; only which of two
    equal-scoring ids is reported can swap (observed once in 4096 rows
    x 62592 Gaussian buckets at fan=32).
    """
    B, G = bm.shape
    if fan is None:
        fan = _two_level_fan(G)
    if kk >= G or G <= fan * kk:
        # few enough columns that the "two-level" gather would cover
        # (nearly) the whole matrix -- direct is strictly simpler
        return jax.lax.top_k(bm, min(kk, G))
    pad = (-G) % fan
    if pad:
        bm = jnp.pad(bm, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    mem = bm.reshape(B, -1, fan)                             # [B, S, F]
    _, sb = jax.lax.top_k(mem.max(-1), kk)                   # [B, kk] supers
    rows = jnp.take_along_axis(mem, sb[:, :, None], axis=1)  # [B, kk, F] slices
    gb_all = sb[:, :, None] * fan + jnp.arange(fan)[None, None, :]
    v, sel = jax.lax.top_k(rows.reshape(B, -1), kk)
    gb = jnp.take_along_axis(gb_all.reshape(B, -1), sel, axis=1)
    return v, gb


def group_table_for_rescore(table, bucket: int | None = None, nb: int = 128):
    """One-time [Gp, bucket, D] copy of `table` where each STRIDED pallas
    bucket's members (ops/pallas_topk.fused_bucket_max partition: bucket
    g = rows (g//nb)*bucket*nb + g%nb + arange(bucket)*nb) are
    CONTIGUOUS. Stage 2's rescore gather then moves one 4 KB slice per
    selected bucket instead of `bucket` scattered 256 B rows -- measured
    r5 at 1M items (B=4096, kk=150): 113 ms flat row-gather -> 49 ms
    slice gather; the copy itself costs ~18 ms + one extra table of HBM
    and is built ONCE outside the per-batch scan (runner predict_topk /
    prod_bench)."""
    bucket = bucket or DEFAULT_BUCKET
    N = table.shape[0]
    n_blocks = -(-N // (bucket * nb))
    g = jnp.arange(n_blocks * nb)
    old = ((g[:, None] // nb) * (bucket * nb) + (g[:, None] % nb)
           + jnp.arange(bucket)[None, :] * nb)
    return table[jnp.minimum(old, N - 1)]


def _exact_rescore_grouped(u, grouped, bias, gb, raw_cand, col_offset,
                           n_valid, n_rows):
    """Grouped-slice variant of `_exact_rescore`: candidate VECTORS come
    from `group_table_for_rescore`'s [Gp, bucket, D] layout ([B, kk]
    slice gathers); masks and returned ids still use `raw_cand` (the
    analytic strided expansion, already N-substituted for pad slots)."""
    B, kk = gb.shape
    bucket = grouped.shape[1]
    cvec = grouped[jnp.minimum(gb, grouped.shape[0] - 1)]      # [B, kk, bucket, D]
    cs = jnp.einsum("bd,bksd->bks", u, cvec.astype(u.dtype)).reshape(B, -1)
    in_range = raw_cand < n_rows
    cand = jnp.minimum(raw_cand, n_rows - 1).astype(jnp.int32)
    if bias is not None:
        cs = cs + bias[cand]
    gcand = cand + col_offset
    ok = in_range & (gcand > 0)
    if n_valid is not None:
        ok = ok & (gcand < n_valid)
    return jnp.where(ok, cs, -jnp.inf), cand


def _exact_rescore(u, table, bias, raw_cand, col_offset, n_valid, n_rows):
    """Gather the candidate rows, rescore exactly, mask by global id.

    `raw_cand` may contain out-of-range ids (the last bucket's expansion
    overhangs a non-divisible catalog): the gather index is clamped but
    the overhang positions' scores are forced to -inf -- clamping alone
    would inject duplicate copies of row n_rows-1 that could occupy
    top-k slots and displace a true winner."""
    in_range = raw_cand < n_rows
    cand = jnp.minimum(raw_cand, n_rows - 1).astype(jnp.int32)
    cvec = table[cand]                                      # [B, C, D] (local rows)
    cs = jnp.einsum("bd,bcd->bc", u, cvec.astype(u.dtype))
    if bias is not None:
        cs = cs + bias[cand]
    gcand = cand + col_offset                               # global id space
    ok = in_range & (gcand > 0)
    if n_valid is not None:
        ok = ok & (gcand < n_valid)
    return jnp.where(ok, cs, -jnp.inf), cand


def _final_select(cs, cand, k, k_wide, clicked_rows, col_offset):
    """Top-k over rescored candidates + clicked knockout; ids -> global."""
    kw = min(k_wide, cs.shape[1])
    v, sel = jax.lax.top_k(cs, kw)
    ids = jnp.take_along_axis(cand, sel, axis=1)
    if not isinstance(col_offset, int) or col_offset != 0:
        ids = ids + col_offset  # local -> global
    if clicked_rows is not None:
        hit = (ids[:, :, None] == clicked_rows[:, None, :].astype(ids.dtype)).any(-1)
        v = jnp.where(hit, -jnp.inf, v)
        v, sel2 = jax.lax.top_k(v, min(k, kw))
        ids = jnp.take_along_axis(ids, sel2, axis=1)
    else:
        v, ids = v[:, :k], ids[:, :k]
    return v, ids


def tiled_catalog_topk(u, table, k: int, *, bias=None, clicked_rows=None,
                       n_valid: int | None = None, bucket: int | None = None,
                       tile: int | None = None, approx: bool = False,
                       recall_target: float = 0.98, col_offset=0,
                       grouped_table=None):
    """Exact (or per-tile-approx) masked top-k over u @ table.T + bias,
    streamed over catalog tiles. Returns (values [B, k], item ids [B, k]).

    approx=True swaps stage 1's bucket-max hierarchy for a per-tile
    `lax.approx_max_k` over raw scores (the serving fast lane); the merge
    and clicked knockout stay exact, so recall is >= the monolithic
    approx lane at the same recall_target.

    col_offset (int or shard_map tracer): `table` holds GLOBAL rows
    [col_offset, col_offset+N); masks, clicked comparisons and returned
    ids are in global id space (n_valid too). Used by
    parallel.topk.sharded_catalog_topk for shard-local streaming.
    """
    bucket = bucket or DEFAULT_BUCKET   # late-bound: tests/tuning override
    tile = tile or DEFAULT_TILE          # the module attrs at call time
    B = u.shape[0]
    N = table.shape[0]
    M = clicked_rows.shape[1] if clicked_rows is not None else 0
    k_wide = min(k + M, N)

    if _use_pallas() and N >= bucket * 128:
        # fused stage 1: matmul + mask + strided-bucket max in VMEM
        # (ops/pallas_topk.py); stage 2 identical modulo the strided
        # bucket -> item expansion. The approx lane shares this path
        # (r5): selecting approximately at the BUCKET level and rescoring
        # the winners' items exactly beats the old per-tile
        # `approx_max_k` over raw scores -- the per-128k-tile
        # PartialReduce was ~20 ms/tile x 8 tiles at 1M items, vs one
        # 18 ms fused bucket-max + one 23 ms approx select here -- and
        # its recall is >= the raw-score lane's at the same target
        # (bucket maxes only merge candidates, never drop a window).
        from rechorus_tpu.ops import pallas_topk as PT

        if grouped_table is not None:
            # a grouped copy built with a different bucket/nb than this
            # call would pair candidate IDS from one partition with
            # VECTORS from another -- plausible but wrong results
            if grouped_table.shape[1] != bucket or \
                    grouped_table.shape[0] * bucket < N:
                raise ValueError(
                    f"grouped_table {tuple(grouped_table.shape)} does not "
                    f"match bucket={bucket}, N={N}; rebuild it with "
                    "group_table_for_rescore(table, bucket=...)")
        bm = PT.fused_bucket_max(u, table, bucket=bucket, bias=bias,
                                 n_valid=n_valid, col_offset=col_offset)
        kk = min(k_wide, bm.shape[1])
        if approx:
            gv, gb = jax.lax.approx_max_k(bm, kk, recall_target=recall_target)
            gb = gb.astype(jnp.int32)
        elif bm.shape[1] >= TWO_LEVEL_MIN_G:
            gv, gb = two_level_bucket_select(bm, kk)
            gb = gb.astype(jnp.int32)
        else:
            gv, gb = jax.lax.top_k(bm, kk)
        raw_cand = PT.expand_bucket_items(gb, bucket)
        # a -inf selected bucket is a pad slot (fewer than kk finite
        # buckets): with the strided layout expand_bucket_items can
        # alias pad/overhang ids back onto REAL item positions when
        # G % NB != 0, injecting duplicate candidates. Force their
        # expansions out of range so _exact_rescore masks them
        # (ADVICE r3).
        pad_mask = jnp.repeat(jnp.isneginf(gv), bucket, axis=1)
        raw_cand = jnp.where(pad_mask, N, raw_cand)
        if grouped_table is not None:
            cs, cand = _exact_rescore_grouped(u, grouped_table, bias, gb,
                                              raw_cand, col_offset, n_valid, N)
        else:
            cs, cand = _exact_rescore(u, table, bias, raw_cand,
                                      col_offset, n_valid, N)
        return _final_select(cs, cand, k, k_wide, clicked_rows, col_offset)

    n_full, full_span, tail_rows, tile = _tile_plan(N, tile, 1 if approx else bucket)

    def tile_candidates(start, rows):
        s = _tile_scores(u, table, bias, start, rows, n_valid, col_offset)
        if approx:
            kk = min(k_wide, rows)
            v, i = jax.lax.approx_max_k(s, kk, recall_target=recall_target)
            return v, (start + i).astype(jnp.int32), kk
        bm = _bucket_max(s, bucket)
        kk = min(k_wide, bm.shape[1])
        v, b = jax.lax.top_k(bm, kk)
        return v, (start // bucket + b).astype(jnp.int32), kk

    # full tiles under a scan (one trace), static tail chunk separately
    cand_v, cand_i = [], []
    if n_full:
        # dynamic-start variant of tile_candidates for the scan body
        def tstep(carry, ti):
            start = ti * tile
            t = jax.lax.dynamic_slice_in_dim(table, start, tile, 0)
            s = u @ t.T
            if bias is not None:
                s = s + jax.lax.dynamic_slice_in_dim(bias, start, tile)[None, :]
            cols = col_offset + start + jnp.arange(tile)
            ok = cols > 0
            if n_valid is not None:
                ok = ok & (cols < n_valid)
            s = jnp.where(ok[None, :], s, -jnp.inf)
            if approx:
                kk = min(k_wide, tile)
                v, i = jax.lax.approx_max_k(s, kk, recall_target=recall_target)
                return carry, (v, (start + i).astype(jnp.int32))
            bm = _bucket_max(s, bucket)
            kk = min(k_wide, bm.shape[1])
            v, b = jax.lax.top_k(bm, kk)
            return carry, (v, (start // bucket + b).astype(jnp.int32))

        _, (tv, tb) = jax.lax.scan(tstep, 0, jnp.arange(n_full))
        cand_v.append(jnp.moveaxis(tv, 0, 1).reshape(B, -1))
        cand_i.append(jnp.moveaxis(tb, 0, 1).reshape(B, -1))
    if tail_rows:
        v, i, _ = tile_candidates(full_span, tail_rows)
        cand_v.append(v)
        cand_i.append(i)
    all_v = jnp.concatenate(cand_v, axis=1)
    all_i = jnp.concatenate(cand_i, axis=1)

    if approx:
        cand = all_i  # item ids already; scores exact per tile
        cs = all_v
    else:
        # global top k_wide buckets -> expand to their items, rescore exactly
        kk = min(k_wide, all_v.shape[1])
        _, sel = jax.lax.top_k(all_v, kk)
        gb = jnp.take_along_axis(all_i, sel, axis=1)            # [B, kk] bucket ids
        raw = (gb[:, :, None] * bucket + jnp.arange(bucket)[None, None, :]).reshape(B, -1)
        cs, cand = _exact_rescore(u, table, bias, raw, col_offset, n_valid, N)

    return _final_select(cs, cand, k, k_wide, clicked_rows, col_offset)


def tiled_catalog_ranks(u, table, target_col, clicked_rows, bias=None,
                        n_valid: int | None = None, tile: int | None = None):
    """Ground-truth catalog rank with clicked masking, streamed over tiles
    (same result as `pallas_kernels.catalog_ranks` over dense scores; see
    that docstring for the reference semantics being implemented).

    rank = 1 + #{catalog j: s_j >= s_target} - #{clicked j: s_j >= s_t}
             - [s_0 >= s_t], counted tile-by-tile without a [B, N] matrix.
    """
    tile = tile or DEFAULT_TILE
    target_col = target_col.astype(jnp.int32)
    tvec = table[target_col]                                    # [B, D]
    tscore = jnp.einsum("bd,bd->b", u, tvec.astype(u.dtype))
    if bias is not None:
        tscore = tscore + bias[target_col]

    N = table.shape[0]
    n_full, full_span, tail_rows, tile = _tile_plan(N, tile)

    if _use_pallas():
        from rechorus_tpu.ops import pallas_topk as PT

        total = PT.fused_ge_count(u, table, tscore, target_col=target_col,
                                  bias=bias, n_valid=n_valid)
        return _ranks_epilogue(u, table, bias, target_col, tscore,
                               clicked_rows, total)

    def count_ge(start, rows):
        t = jax.lax.dynamic_slice_in_dim(table, start, rows, 0)
        s = u @ t.T
        if bias is not None:
            s = s + jax.lax.dynamic_slice_in_dim(bias, start, rows)[None, :]
        cols = start + jnp.arange(rows)
        ok = (cols > 0)[None, :]
        if n_valid is not None:
            ok = ok & (cols < n_valid)[None, :]
        # the target's own column compares matmul-score vs einsum-tscore
        # (1-ulp apart); exclude it here, re-added exactly below
        ok = ok & (cols[None, :] != target_col[:, None])
        ge = (s >= tscore[:, None]) & ok
        return ge.sum(axis=1).astype(jnp.int32)

    total = jnp.zeros((u.shape[0],), jnp.int32)
    if n_full:
        def tstep(acc, ti):
            return acc + count_ge(ti * tile, tile), None
        total, _ = jax.lax.scan(tstep, total, jnp.arange(n_full))
    if tail_rows:
        total = total + count_ge(full_span, tail_rows)
    return _ranks_epilogue(u, table, bias, target_col, tscore, clicked_rows, total)


def _ranks_epilogue(u, table, bias, target_col, tscore, clicked_rows, total):
    cvec = table[clicked_rows.astype(jnp.int32)]                # [B, M, D]
    cscore = jnp.einsum("bd,bmd->bm", u, cvec.astype(u.dtype))
    if bias is not None:
        cscore = cscore + bias[clicked_rows.astype(jnp.int32)]
    # the target's residual copy in clicked_rows would compare two
    # differently-shaped einsums at exact equality (1-ulp fragile, like
    # the target's own tile column) -- count it symbolically instead
    not_target = clicked_rows != target_col[:, None]
    clicked_ge = ((cscore >= tscore[:, None]) & (clicked_rows > 0) & not_target).sum(axis=1)
    target_in_clicked = (~not_target).any(axis=1).astype(jnp.int32)
    # identity vs the dense path: dense rank = #{j>0: s_j >= t} -
    # clicked_ge_dense + 1, where the target's column contributes exactly
    # 1 to the count and its clicked copy exactly 1 to clicked_ge_dense.
    # The tile counts exclude col 0 and the target's column, so:
    return total + 2 - clicked_ge.astype(jnp.int32) - target_in_clicked


def tiled_ge_count(u, table, tscore, bias=None, clicked_rows=None,
                   n_valid: int | None = None, col_offset=0,
                   tile: int | None = None, target_col=None):
    """#{cols: s >= tscore, col excluded-mask false} streamed over tiles:
    the building block of the SHARDED rank path (parallel.topk), where
    exclusions are by id (col 0, dead rows, clicked ids) and the target's
    own column arrives pre-excluded via clicked_rows. Returns [B] int32.
    `col_offset` shifts local ids to global for the masks (shard_map
    tracer ok). `target_col` ([B] GLOBAL ids, optional) marks the column
    whose score defines tscore: the Pallas path must exclude it by id
    (its matmul score vs the gathered tscore is a systematic 1-ulp tie);
    the scan path excludes it via clicked_rows like every clicked id, so
    it ignores this hint."""
    tile = tile or DEFAULT_TILE
    N = table.shape[0]
    n_full, full_span, tail_rows, tile = _tile_plan(N, tile)

    if _use_pallas():
        from rechorus_tpu.ops import pallas_topk as PT

        total = PT.fused_ge_count(u, table, tscore, bias=bias,
                                  n_valid=n_valid, col_offset=col_offset,
                                  target_col=target_col)
        if clicked_rows is not None:
            # clicked exclusion via a gathered correction: subtract the
            # clicked columns the fused count included (in-shard, id > 0,
            # id < n_valid, != target). Scores come from a [B, M, D]
            # einsum -- 1 ulp from the kernel's matmul at exact CROSS-item
            # ties (measure-zero; same caveat as _ranks_epilogue); clicked
            # ids are unique per row by contract.
            local = clicked_rows.astype(jnp.int32) - col_offset
            in_shard = (local >= 0) & (local < N)
            rows = jnp.clip(local, 0, N - 1)
            cs = jnp.einsum("bd,bmd->bm", u, table[rows].astype(u.dtype))
            if bias is not None:
                cs = cs + bias[rows]
            ok = in_shard & (clicked_rows > 0)
            if n_valid is not None:
                ok = ok & (clicked_rows < n_valid)
            if target_col is not None:
                ok = ok & (clicked_rows != target_col[:, None])
            sub = ((cs >= tscore[:, None]) & ok).sum(axis=1)
            total = total - sub.astype(jnp.int32)
        return total

    def count(start, rows):
        t = jax.lax.dynamic_slice_in_dim(table, start, rows, 0)
        s = u @ t.T
        if bias is not None:
            s = s + jax.lax.dynamic_slice_in_dim(bias, start, rows)[None, :]
        cols = col_offset + start + jnp.arange(rows)
        gids = cols[None, :]
        excl = (gids == 0)
        if n_valid is not None:
            excl = excl | (gids >= n_valid)
        if clicked_rows is not None:
            excl = excl | (gids[:, :, None] == clicked_rows[:, None, :]).any(-1)
        ge = (s >= tscore[:, None]) & ~excl
        return ge.sum(axis=1).astype(jnp.int32)

    total = jnp.zeros((u.shape[0],), jnp.int32)
    if n_full:
        def tstep(acc, ti):
            return acc + count(ti * tile, tile), None
        total, _ = jax.lax.scan(tstep, total, jnp.arange(n_full))
    if tail_rows:
        total = total + count(full_span, tail_rows)
    return total
