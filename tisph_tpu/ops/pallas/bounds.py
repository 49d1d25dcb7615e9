"""CSR cell bounds as a Pallas compare-reduce (TPU fast path).

``bounds[c] = #(sorted ids < c)`` for c in [0, num_cells] — the same
contract as grid.csr_bounds / csr_bounds_hist (the structure the reference
builds with an atomic histogram + prefix sum, partice_systemv4.py:206-215).

The jnp builder is a scatter-add histogram + cumsum; XLA scatters
serialize on TPU and the 195k-particle scatter measured ~3 ms flat across
every formulation tried (ROADMAP round 3).  Here the scatter disappears
entirely:

- ids are ALREADY SORTED (the builder runs right after the cell sort), so
  the ids relevant to a 1024-cell block of bounds entries are ONE
  contiguous window of the id array;
- a cheap coarse ``searchsorted`` at block granularity (num_cells/1024
  queries, not num_cells) finds each block's window;
- the kernel computes all 1024 counts of its block as (128, T)
  compare-reduces on the VPU: cells ride the sublane axis (a
  broadcasted_iota), the id window rides the lane axis, and
  ``count(c) = window_base + sum_lanes (id < c)`` — no cumsum needed
  because each count is already the GLOBAL prefix count (ids before the
  window base are all < the block's first cell; ids after the window all
  >= its last cell and contribute 0 to the masked sum).

Total compare work is 128 * sum(window lengths) ~ 128 * (n + overlap)
lane-ops — microseconds at 195k — so the cost is per-block fixed overhead
(DMA + loop), two orders below the scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_CELLS_PER_BLOCK = 1024  # 8 output sublanes x 128 lanes per grid step


def _bounds_kernel(wrow_ref, ntiles_ref, ids_hbm, out_ref, buf, sem, *,
                   tile: int):
    """One grid step = one (8, 128) tile of bounds entries (1024 cells).

    wrow/ntiles (scalar prefetch): this block's id-window start in units
    of the 128-lane grid, and its tile count.  The window is DMA'd tile by
    tile; each tile is compared against the block's 1024 cells.
    """
    blk = pl.program_id(0)
    base = wrow_ref[blk] * _LANE          # window start (lane-aligned)
    nt = ntiles_ref[blk]
    c0 = blk * _CELLS_PER_BLOCK

    def dma(t):
        ws = pl.multiple_of(base + t * tile, _LANE)
        return pltpu.make_async_copy(
            ids_hbm.at[0, pl.ds(ws, tile)], buf.at[0], sem
        )

    # cells on the SUBLANE axis: (128, tile) compare against the lane-axis
    # id tile; 8 column groups of 128 cells cover the block's 1024 cells.
    # The accumulator is a TUPLE of (128, 1) columns — value-level
    # .at[col].set would emit a scatter Mosaic cannot lower (round-3
    # lesson, see sweeps._seg_sweep_kernel's row-iota select).
    subl = jax.lax.broadcasted_iota(jnp.int32, (_LANE, tile), 0)

    def body(t, acc):
        dma(t).start()
        dma(t).wait()
        idv = buf[0, :][None, :]          # (1, tile) -> broadcast sublanes
        return tuple(
            acc[g] + jnp.sum(
                jnp.where(idv < c0 + g * _LANE + subl, 1, 0),
                axis=1, keepdims=True,
            )
            for g in range(8)
        )

    acc0 = tuple(jnp.zeros((_LANE, 1), jnp.int32) for _ in range(8))
    acc = jax.lax.fori_loop(0, nt, body, acc0)
    # counts are (cells-on-sublanes, group); the output tile wants
    # (group, cells-on-lanes)
    out_ref[:, :] = jnp.transpose(jnp.concatenate(acc, axis=1), (1, 0)) + base


def csr_bounds_sorted(
    sorted_ids: jax.Array, num_cells: int, tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """bounds[c] = first sorted index with id >= c, c in [0, num_cells].

    Requires SORTED input (ids ascending; inactive tail = sentinel
    ``num_cells``).  Matches grid.csr_bounds_hist exactly (cross-checked in
    tests/test_grid.py)."""
    n = sorted_ids.shape[0]
    nbl = -(-(num_cells + 1) // _CELLS_PER_BLOCK)
    # coarse window search at block granularity: qs[b] = first index with
    # id >= b*1024.  nbl+1 queries (vs num_cells for the full bounds)
    queries = jnp.minimum(
        jnp.arange(nbl + 1, dtype=jnp.int32) * _CELLS_PER_BLOCK, num_cells
    )
    qs = jnp.searchsorted(sorted_ids, queries, side="left").astype(jnp.int32)
    wrow = qs[:-1] // _LANE               # lane-aligned window start rows
    ntiles = pl.cdiv(qs[1:] - wrow * _LANE, tile)

    # pad so every window tile read stays in bounds; the sentinel pad
    # (num_cells >= every queried cell) contributes 0 to every count
    n_pad = -(-n // tile) * tile + tile
    ids_p = jnp.pad(
        sorted_ids.astype(jnp.int32), (0, n_pad - n),
        constant_values=num_cells,
    )[None, :]

    out = pl.pallas_call(
        functools.partial(_bounds_kernel, tile=tile),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nbl,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, _LANE), lambda k, wrow, nt: (k, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((1, tile), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nbl * 8, _LANE), jnp.int32),
        interpret=interpret,
    )(wrow, ntiles, ids_p)
    return out.reshape(-1)[: num_cells + 1]
