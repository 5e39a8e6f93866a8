"""Pallas pipelined row scatter: table[rows[i]] = block[i].

XLA lowers a row scatter (`table.at[rows].set(block)`) to one serialized
DMA per row -- 226 ns/row isolated at [8192, 128] rows into [1M, 128]
(docs/PERF.md r4 microbench), transaction-latency-bound. This kernel
issues the same per-row copies as explicit async DMAs with a DEPTH-deep
software pipeline; rows stream through SMEM (scalar prefetch) and each
grid step's value block sits in VMEM.

MEASURED OUTCOME (v5e, r4): 166 ns/row at rpb=512 -- 1.36x over XLA's
scatter isolated, bounded by the per-row ISSUE rate (SMEM id read +
predicate + descriptor setup in the scalar core), not DMA completion:
deeper pipelining (DEPTH 8), a single accumulated-semaphore wait per
grid step, and larger blocks all measured within noise of each other.
In situ the XLA scatter overlaps to ~81 ns/row, so this kernel is NOT
wired into the packed sparse-Adam commit -- the plumbing it needs
(row width padded to the 128-lane DMA alignment: [N, 3D] -> [N, 256]
at D=64, +33% gather traffic) costs more than the isolated win. Kept
as the measured baseline for a future coalescing kernel (sorting rows
into contiguous runs would turn per-row DMAs into block DMAs -- but
the sort itself is the 1.2 ms the hashed dedup just removed).

Semantics match `.at[rows].set(block, mode="drop")` for UNIQUE row ids:
rows >= n_rows are dropped; duplicate ids would race (the sparse lane's
`unique_rows_hashed` guarantees one winner per id). The table aliases
in/out, so untouched rows pass through without a copy. NB Mosaic
requires the row width D to be a multiple of the 128-lane tile.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEPTH = 8          # in-flight copies per grid step
DEFAULT_RPB = 512  # rows per grid step (VMEM block = RPB * D * 4 bytes)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _scatter_kernel(rows_ref, blk_ref, tbl_in_ref, tbl_out_ref, sems,
                    *, rpb: int, n_rows: int):
    del tbl_in_ref  # aliased to tbl_out_ref; present only for donation
    base = pl.program_id(0) * rpb

    def cp(j):
        r = rows_ref[base + j]
        return r, pltpu.make_async_copy(
            blk_ref.at[j], tbl_out_ref.at[r], sems.at[j % DEPTH])

    def issue(j, _):
        # drain slot j-DEPTH before reusing its semaphore
        @pl.when(j >= DEPTH)
        def _():
            r0 = rows_ref[base + j - DEPTH]

            @pl.when(r0 < n_rows)
            def _():
                pltpu.make_async_copy(
                    blk_ref.at[j - DEPTH],
                    tbl_out_ref.at[jnp.minimum(r0, n_rows - 1)],
                    sems.at[(j - DEPTH) % DEPTH]).wait()
        r, dma = cp(j)

        @pl.when(r < n_rows)
        def _():
            pltpu.make_async_copy(
                blk_ref.at[j], tbl_out_ref.at[jnp.minimum(r, n_rows - 1)],
                sems.at[j % DEPTH]).start()
        return 0

    jax.lax.fori_loop(0, rpb, issue, 0)

    def drain(j, _):
        r = rows_ref[base + j]

        @pl.when(r < n_rows)
        def _():
            pltpu.make_async_copy(
                blk_ref.at[j], tbl_out_ref.at[jnp.minimum(r, n_rows - 1)],
                sems.at[j % DEPTH]).wait()
        return 0

    jax.lax.fori_loop(max(0, rpb - DEPTH), rpb, drain, 0)


def scatter_rows(table: jnp.ndarray, rows: jnp.ndarray, block: jnp.ndarray,
                 rpb: int = DEFAULT_RPB) -> jnp.ndarray:
    """table.at[rows].set(block, mode='drop') for unique rows via
    pipelined DMAs. table [N, D]; rows [R] int32 (entries >= N dropped);
    block [R, D] same dtype as table. Returns the updated table (the
    input buffer is donated/aliased)."""
    N, D = table.shape
    R = rows.shape[0]
    if block.shape != (R, D) or block.dtype != table.dtype:
        raise ValueError(f"block {block.shape}/{block.dtype} vs table {table.shape}/{table.dtype}")
    rpb = min(rpb, R)
    pad = (-R) % rpb
    if pad:
        rows = jnp.concatenate([rows, jnp.full((pad,), N, jnp.int32)])
        block = jnp.concatenate([block, jnp.zeros((pad, D), block.dtype)])
    grid = (rows.shape[0] // rpb,)

    kernel = functools.partial(_scatter_kernel, rpb=rpb, n_rows=N)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # rows
        grid=grid,
        in_specs=[
            # index_map gets (grid idx, scalar-prefetch ref)
            pl.BlockSpec((rpb, D), lambda i, rows: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # table (HBM, aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((DEPTH,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={2: 0},  # table input (after rows, block) -> output
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(rows.astype(jnp.int32), block, table)
