"""Uniform-grid spatial binning: sort-based, atomic-free, static-shape.

This replaces the reference's two native mechanisms (SURVEY.md §2.4):

- the atomic histogram + ``PrefixSumExecutor`` + counting-sort resort
  (partice_systemv4.py:206-258) becomes a stable ``lax.sort_key_val`` on
  flat cell ids followed by a gather-permutation of all state fields —
  TPUs have no scatter-atomics in the programming model, and a single
  fused sort is the idiomatic XLA replacement;
- the CSR cell ranges read by ``for_all_neighbors``
  (partice_systemv4.py:331-345) become ``searchsorted`` bounds over the
  sorted ids, then per-particle *stencil runs*: with row-major flat ids
  (last axis fastest), the 3 cells {z-1, z, z+1} of each of the
  3^(dim-1) neighbor rows are contiguous in the sorted particle array, so
  the 27-cell (3D) / 9-cell (2D) neighborhood collapses to 9 / 3
  contiguous index ranges.  Sweeps then gather fixed-capacity windows of
  those runs with masks — static shapes end to end.

The reference's CSR traversal has an off-by-one making cell 0's particles
invisible (partice_systemv4.py:343, SURVEY.md §7.3); the bounds here are
exact.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tisph_tpu.models.state import SimState, MATERIAL_INVALID


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Static grid geometry (hashable; closed over by jit).

    cell size = support length = 4 * particle radius
    (partice_systemv4.py:34, :59-60); resolution = ceil(domain_size / cell).
    """

    dim: int
    domain_start: tuple[float, ...]
    domain_end: tuple[float, ...]
    cell_size: float
    res: tuple[int, ...]
    run_cap: int  # fixed gather capacity per stencil run (overflow-checked)

    @property
    def num_cells(self) -> int:
        return int(np.prod(self.res))

    @property
    def num_rows(self) -> int:
        """Stencil rows: 3^(dim-1) contiguous runs cover the 3^dim cells."""
        return 3 ** (self.dim - 1)

    @property
    def strides(self) -> tuple[int, ...]:
        """Row-major strides, last axis fastest."""
        s = [1] * self.dim
        for i in range(self.dim - 2, -1, -1):
            s[i] = s[i + 1] * self.res[i + 1]
        return tuple(s)


def make_grid_spec(
    dim: int,
    domain_start: Sequence[float],
    domain_end: Sequence[float],
    support_length: float,
    run_cap: int = 96,
) -> GridSpec:
    res = tuple(
        int(math.ceil((e - s) / support_length))
        for s, e in zip(domain_start, domain_end)
    )
    return GridSpec(
        dim=dim,
        domain_start=tuple(float(v) for v in domain_start),
        domain_end=tuple(float(v) for v in domain_end),
        cell_size=float(support_length),
        res=res,
        run_cap=int(run_cap),
    )


def cell_coords(x: jax.Array, spec: GridSpec) -> jax.Array:
    """Integer cell coordinates, clipped into the grid.

    Reference ``pos_to_index`` (partice_systemv4.py:86-92) asserts instead of
    clipping; clipping keeps out-of-domain stragglers in edge cells so the
    step stays total (overflow is surfaced via metrics instead)."""
    start = jnp.asarray(spec.domain_start, dtype=x.dtype)
    c = jnp.floor((x - start) / spec.cell_size).astype(jnp.int32)
    hi = jnp.asarray(spec.res, dtype=jnp.int32) - 1
    return jnp.clip(c, 0, hi)


def flat_cell_ids(coords: jax.Array, material: jax.Array, spec: GridSpec) -> jax.Array:
    """Row-major flat ids (reference flatten_grid_index,
    partice_systemv4.py:100-101); inactive slots get the sentinel id
    ``num_cells`` so a stable sort pushes them to the tail."""
    strides = jnp.asarray(spec.strides, dtype=jnp.int32)
    ids = jnp.sum(coords * strides, axis=-1)
    return jnp.where(material == MATERIAL_INVALID, spec.num_cells, ids)


def sort_state_by_cell(state: SimState, spec: GridSpec) -> tuple[SimState, jax.Array, jax.Array]:
    """Spatially reorder the whole particle SoA by cell id.

    Replaces the reference's per-step counting-sort ``resort`` of 10 fields
    through double buffers (partice_systemv4.py:217-258).  Returns
    (sorted_state, sorted_ids, perm).  Stable: preserves in-cell order like
    the reference's reverse-scan counting sort.
    """
    coords = cell_coords(state.x, spec)
    ids = flat_cell_ids(coords, state.material, spec)
    iota = jnp.arange(state.capacity, dtype=jnp.int32)
    sorted_ids, perm = jax.lax.sort_key_val(ids, iota, is_stable=True)
    sorted_state = jax.tree.map(
        lambda a: jnp.take(a, perm, axis=0) if a.ndim >= 1 else a, state
    )
    return sorted_state, sorted_ids, perm


def csr_bounds(sorted_ids: jax.Array, spec: GridSpec) -> jax.Array:
    """bounds[c] = first sorted index with cell id >= c, for c in [0, G].

    The particles of cell c occupy sorted[bounds[c]:bounds[c+1]] — the CSR
    structure the reference builds with an atomic histogram + parallel
    prefix sum (partice_systemv4.py:206-215, :255)."""
    queries = jnp.arange(spec.num_cells + 1, dtype=sorted_ids.dtype)
    return jnp.searchsorted(sorted_ids, queries, side="left").astype(jnp.int32)


def _row_offsets(spec: GridSpec) -> np.ndarray:
    """Static (num_rows, dim-1) array of stencil row offsets in {-1,0,1}."""
    if spec.dim == 1:
        return np.zeros((1, 0), dtype=np.int32)
    grids = np.meshgrid(*([np.arange(-1, 2, dtype=np.int32)] * (spec.dim - 1)), indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=-1)


def stencil_runs(coords: jax.Array, bounds: jax.Array, spec: GridSpec) -> jax.Array:
    """Per-particle neighbor runs: (N, num_rows, 2) int32 [start, end).

    For a particle in cell (c_0..c_{d-1}) and row offset (o_0..o_{d-2}), the
    run covers cells (c+o, z) for z in [c_{d-1}-1, c_{d-1}+1] clipped — one
    contiguous slice of the sorted particle array.  Rows falling outside the
    grid yield empty runs.
    """
    offsets = _row_offsets(spec)  # (R, dim-1) static
    res = np.asarray(spec.res)
    strides = np.asarray(spec.strides)

    lead = coords[:, : spec.dim - 1]  # (N, dim-1)
    z = coords[:, spec.dim - 1]  # (N,)
    z_lo = jnp.maximum(z - 1, 0)
    z_hi = jnp.minimum(z + 1, int(res[-1]) - 1)

    runs = []
    for o in offsets:
        nb = lead + jnp.asarray(o, dtype=jnp.int32)  # (N, dim-1)
        valid = jnp.all((nb >= 0) & (nb < jnp.asarray(res[:-1], dtype=jnp.int32)), axis=-1)
        base = jnp.sum(nb * jnp.asarray(strides[:-1], dtype=jnp.int32), axis=-1)
        c_lo = base + z_lo
        c_hi = base + z_hi
        start = jnp.where(valid, bounds[jnp.clip(c_lo, 0, spec.num_cells)], 0)
        end = jnp.where(valid, bounds[jnp.clip(c_hi + 1, 0, spec.num_cells)], 0)
        runs.append(jnp.stack([start, end], axis=-1))
    return jnp.stack(runs, axis=1)  # (N, num_rows, 2)


def max_run_length(runs: jax.Array) -> jax.Array:
    """Longest run across all particles/rows — overflow accounting against
    ``spec.run_cap`` (the reference instead corrupts memory on cell overflow,
    partice_systemv3.py:214-217; we surface it as a metric)."""
    return jnp.max(runs[..., 1] - runs[..., 0])


def suggest_run_cap(state: SimState, spec: GridSpec, slack: float = 1.5) -> int:
    """Measure the max run length of the initial configuration and pad with
    slack, rounded to a multiple of 8.  Host-side, at build time."""
    sorted_state, sorted_ids, _ = sort_state_by_cell(state, spec)
    bounds = csr_bounds(sorted_ids, spec)
    coords = cell_coords(sorted_state.x, spec)
    runs = stencil_runs(coords, bounds, spec)
    m = int(jax.device_get(max_run_length(runs)))
    return max(8, int(-(-(m * slack) // 8) * 8))
