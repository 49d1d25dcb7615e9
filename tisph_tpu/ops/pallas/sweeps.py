"""Fused Pallas neighbor sweeps (density / forces) for WCSPH.

Same blockwise-window structure as ops/neighbors.neighbor_sweep_blocked —
cell-sorted particles, one contiguous candidate window per (block, stencil
row) — but with the streaming made explicit:

- the j-side state is packed into ONE transposed (16, N) f32 array (fields
  on the sublane axis, particles on the lane axis) so a window is a single
  lane-aligned DMA HBM -> VMEM; window starts are quantised to the 128-lane
  grid (cell ids ride along as exact f32 integers, guarded by
  ``num_cells < 2**24``);
- per (block, row) window *lengths* are prefetched and the kernel loops
  ``ceil(len / TILE)`` tiles — work scales with the actual neighborhood,
  not the worst-case cap the jnp tier always pays;
- windows are double-buffered: the next stencil row's DMA is in flight
  while the current row computes;
- all pair math is (block, tile) 2-D component arithmetic on the VPU — no
  3-D intermediates;
- per-pair physics is identical to the factories in ops/forces.py
  (reference equations wcsphv2.py:18-93, sph_basev2.py:64-78).

Packed-row layout (transposed), split so the density/bvol sweeps (which
need only position, cell id, eff_mass / bound flag) can fetch HALF-height
(8, W) windows — the force sweep fetches all 16 rows:
  0..2  x | 3 cell id (f32) | 4 eff_mass (fluid*m + bound*rho0*V — the
  density-sweep coefficient) | 5 bound | 6 density | 7 p/rho^2
  (precomputed per particle, saves a per-lane divide in the force sweep)
  8..10 v | 11 mass | 12 volume | 13 fluid | 14 pressure | 15 fl*mass
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tisph_tpu.config import SolverParams
from tisph_tpu.models.state import MATERIAL_BOUNDARY, MATERIAL_FLUID
from tisph_tpu.ops.grid import GridSpec, _row_offsets
from tisph_tpu.ops.kernels import cubic_kernel_sigma

F_ROWS = 16
D_ROWS = 8  # density/bvol sweeps read rows [0, 8) only — half-width fetch
_X, _ID, _EFFM, _BD, _RHO, _PRHO2 = 0, 3, 4, 5, 6, 7
_V, _M, _VOL, _FL, _P = 8, 11, 12, 13, 14
_FLM = 15  # fl * m (precomputed: the force tile's fluid-mass coefficient;
#            bd * rho0 * V falls out as _EFFM - _FLM)
_LANE = 128  # window starts are quantised to this lane grid

# Scoped-VMEM budget for the seg sweep's DECLARED scratch (jbuf + cbuf);
# the Mosaic scoped limit is 16 MiB shared with the kernel's stack
# temporaries, which are NOT in the declared shapes and scale with the
# fetch width (measured: at s_pass=8192/3D the declared scratch is
# 13.8 MiB but the scoped allocation hit 16.11 MiB — ~2.3 MiB of stack).
# 12 MiB keeps declared + width-scaled stack ~2 MiB under the limit.
# Window caps whose scratch exceeds this run as multiple segment passes
# (_run_sweep_seg).
_VMEM_BUDGET_BYTES = 12 << 20
_PASS_CAP_OVERRIDE: int | None = None  # test hook: force tiny segment passes


def _seg_pass_lanes(rows: int, f_rows: int, sub: int, tile: int) -> int:
    """Largest tile-multiple per-pass window whose VMEM scratch fits the
    budget: 4*f_rows*(2*rows*(S + 256) + sub*(rows*S + tile + 256)) bytes
    (jbuf double buffer + compacted streams, both linear in the fetch
    width S)."""
    if _PASS_CAP_OVERRIDE is not None:
        return max(tile, (_PASS_CAP_OVERRIDE // tile) * tile)
    budget = _VMEM_BUDGET_BYTES // (4 * f_rows)
    s = (budget - 2 * rows * 2 * _LANE - sub * (tile + 2 * _LANE)) // (
        (2 + sub) * rows
    )
    w = (int(s) // tile) * tile
    if w < tile:
        # even a single-tile pass would exceed the scoped-VMEM budget —
        # clamping to ``tile`` here would silently recreate the Mosaic
        # 16 MiB compile failure the segmentation exists to prevent
        # (ADVICE r4 #3).  Reachable only at degenerate parameter combos
        # (huge rows*sub against the budget).
        raise ValueError(
            f"seg sweep cannot fit one {tile}-lane pass in the "
            f"{_VMEM_BUDGET_BYTES >> 20} MiB VMEM budget "
            f"(rows={rows}, f_rows={f_rows}, sub={sub}, tile={tile}); "
            "reduce tile/sub_slabs"
        )
    return w


def pack_state(
    x: jax.Array,
    v: jax.Array,
    density: jax.Array,
    pressure: jax.Array,
    mass: jax.Array,
    volume: jax.Array,
    material: jax.Array,
    sorted_ids: jax.Array,
    params: SolverParams,
) -> jax.Array:
    """Pack sorted per-particle fields into the transposed (16, N) array."""
    n, dim = x.shape
    fl = (material == MATERIAL_FLUID).astype(jnp.float32)
    bd = (material == MATERIAL_BOUNDARY).astype(jnp.float32)
    zero = jnp.zeros((n,), jnp.float32)
    rows = [zero] * F_ROWS
    for a in range(dim):
        rows[_X + a] = x[:, a]
        rows[_V + a] = v[:, a]
    rows[_RHO] = density
    rows[_P] = pressure
    rows[_M] = mass
    rows[_VOL] = volume
    rows[_FL] = fl
    rows[_BD] = bd
    rows[_FLM] = fl * mass
    rows[_EFFM] = rows[_FLM] + bd * (params.density0 * volume)
    rows[_ID] = sorted_ids.astype(jnp.float32)
    rows[_PRHO2] = pressure / jnp.maximum(density * density, 1e-12)
    return jnp.stack(rows, axis=0)


def repack_eos(pack: jax.Array, density: jax.Array, pressure: jax.Array) -> jax.Array:
    """Update the density/pressure-derived rows between the two sweeps."""
    return (
        pack.at[_RHO, :].set(density)
        .at[_P, :].set(pressure)
        .at[_PRHO2, :].set(pressure / jnp.maximum(density * density, 1e-12))
    )


class _TileGeom(NamedTuple):
    """Pair geometry + reduction provider for one (B, T) tile: per-axis
    ``dx`` is materialised and everything derives elementwise on the VPU.
    Accumulators are LANE-SHAPED (block, tile): per-tile folds are pure
    elementwise adds/FMAs and the (B, T) -> (B,) lane reduction happens
    ONCE per block at output time (the per-tile horizontal sum was
    ~log2(T) cross-lane ops per accumulator per tile).  The kernel
    finalizer also applies the deferred k_sig scale (every mode's pair
    contribution is uniformly proportional to the spline normalisation,
    so it is hoisted out of the pair math).

    (An MXU formulation — Gram-matmul r2 over centered coordinates,
    expanded per-axis reductions — was built and retired in rounds 3-4:
    25-30% slower at f32 precision on the v5e, and numerically unusable
    on real hardware because Mosaic lowers in-kernel dot_general to bf16
    passes regardless of Precision.HIGHEST, leaving the r2 cancellation
    at ~h^2 << |x|^2 unguarded.  See ROADMAP "MXU pair-geometry
    formulation: dead".)"""

    r2: jax.Array        # (B, T)
    dot: object          # () -> (B, T) lazy sum_a (vi-vj)_a (xi-xj)_a
    reduce_v: object     # (coef, acc_in) -> updated per-axis accumulators


def _vpu_geom(dim, xi, vi, jrow):
    dx = []
    r2 = None
    for a in range(dim):
        d_a = xi[a][:, None] - jrow(_X + a)[None, :]  # (B, T)
        dx.append(d_a)
        r2 = d_a * d_a if r2 is None else r2 + d_a * d_a

    def dot():
        d = None
        for a in range(dim):
            t = (vi[a][:, None] - jrow(_V + a)[None, :]) * dx[a]
            d = t if d is None else d + t
        return d

    def reduce_v(coef, acc_in):
        return tuple(acc_in[a] + coef * dx[a] for a in range(dim))

    return _TileGeom(r2, dot, reduce_v)


def _tile_math(mode, dim, h, k_sig, params, fast_math,
               ivals, jrow, geom, valid, acc_in):
    """Per-pair physics shared by the linear and seg kernels: evaluates the
    cubic kernel and (mode='force') the fused non-pressure + pressure terms
    on one (B, T) tile.  ``ivals``: i-side operands (see callers); ``jrow``:
    j-window row accessor; ``geom``: pair geometry/reduction provider
    (:class:`_TileGeom`); ``valid`` precomputed by the caller.  Returns the
    updated accumulator tuple."""
    r2 = geom.r2
    # one rsqrt replaces sqrt + divide: r_norm = r2 * rs, 1/r = rs
    rs = jax.lax.rsqrt(jnp.maximum(r2, 1e-12))
    r_norm = r2 * rs
    q = r_norm * (1.0 / h)
    # branchless cubic spline: W/k = 2(1-q)+^3 - 8(0.5-q)+^3 and
    # dW/dq /k = -6(1-q)+^2 + 24(0.5-q)+^2 reproduce the piecewise form
    # exactly (identical to f64 rounding) with two clamps instead of four
    # selects, and the q > 1 cutoff comes free from the clamps.
    p1 = jnp.maximum(1.0 - q, 0.0)
    p2 = jnp.maximum(0.5 - q, 0.0)
    p1sq = p1 * p1
    p2sq = p2 * p2
    # the k_sig spline normalisation is DEFERRED to the kernel's
    # one-per-block finalizer (every mode's contribution is uniformly
    # proportional to it) — saves the two per-pair scale muls.
    w = 2.0 * p1 * p1sq - 8.0 * p2 * p2sq

    if mode == "density":
        contrib = jrow(_EFFM)[None, :] * w
        (a0,) = acc_in
        return (a0 + jnp.where(valid, contrib, 0.0),)

    if mode == "bvol":
        # Akinci boundary-volume denominator: delta_i = W(0) + sum_{j bnd} W
        # (sph_basev2.py:195-201); caller inverts and masks to boundary i.
        contrib = jrow(_BD)[None, :] * w
        (a0,) = acc_in
        return (a0 + jnp.where(valid, contrib, 0.0),)

    # grad W = gmag * r_vec;  1/(r_norm h) = rs / h.  No small-r guard:
    # mag -> 0 linearly as q -> 0, so mag * rs stays bounded, and the
    # self pair needs no exclusion — reduce_v multiplies every term by
    # dx, bitwise 0 for i == j.
    # BOTH uniform scales of the gradient modes, k_sig AND the 1/h of
    # grad W, are deferred to the finalizer (_fin_scale); the cohesion
    # term, which has no 1/h, compensates with an h folded into coh_i.
    mag = 24.0 * p2sq - 6.0 * p1sq
    gmag = mag * rs

    if mode == "reaction":
        # fluid -> boundary reaction (forces.rigid_reaction_kernel):
        # F_i = bvol_i * sum_{j fluid} m_j (nu_b(rho_j) dot_neg - p/rho^2_j)
        #       gradW . r_vec    with bvol_i = rho0 V_i
        dot = geom.dot()
        if fast_math:
            dot_neg = jnp.minimum(dot, 0.0) * pl.reciprocal(
                r2 + 0.01 * h * h, approx=True
            )
            inv_rho_j = pl.reciprocal(jnp.maximum(jrow(_RHO)[None, :], 1e-12),
                                      approx=True)
        else:
            dot_neg = jnp.minimum(dot, 0.0) / (r2 + 0.01 * h * h)
            inv_rho_j = 1.0 / jnp.maximum(jrow(_RHO)[None, :], 1e-12)
        nu_b = (params.boundary_sigma * h * params.c_s * 0.5) * inv_rho_j
        # flm row = fl * m precomputed at pack time
        coef = jrow(_FLM)[None, :] * (
            nu_b * dot_neg - jrow(_PRHO2)[None, :]
        )
        coef = jnp.where(valid, ivals["bvol_i"] * coef * gmag, 0.0)
        return geom.reduce_v(coef, acc_in)

    rho_i = ivals["rho_i"]
    p_rho2_i = ivals["p_rho2_i"]
    coh_i = ivals["coh_i"]      # -surface_tension / m_i, hoisted per i
    nu_b_i = ivals["nu_b_i"]    # sigma h c_s / (2 rho_i), hoisted per i

    # flm = fl * m_j (precomputed row); bd * rho0 * V_j = EFFM - flm
    flm = jrow(_FLM)[None, :]
    bdv = jrow(_EFFM)[None, :] - flm
    rho_j = jrow(_RHO)[None, :]
    p_rho2_j = jrow(_PRHO2)[None, :]

    dot = geom.dot()
    # both divides feed only the (heuristic) viscosity terms;
    # fast_math uses the VPU's approximate reciprocal (~2^-12 rel)
    if fast_math:
        dot_neg = jnp.minimum(dot, 0.0) * pl.reciprocal(
            r2 + 0.01 * h * h, approx=True
        )
        inv_rho_sum = pl.reciprocal(rho_i + rho_j, approx=True)
    else:
        dot_neg = jnp.minimum(dot, 0.0) / (r2 + 0.01 * h * h)
        inv_rho_sum = 1.0 / (rho_i + rho_j)

    nu_f = (2.0 * params.viscosity * h * params.c_s) * inv_rho_sum
    # algebraic regroup of flm*(nu_f*dot_neg - (pi+pj)) + bdv*(nu_b_i*
    # dot_neg - pi): the pressure part collapses through flm + bdv = effm
    # (a loaded row) to effm*pi + flm*pj — two ops fewer per pair
    visc = dot_neg * (flm * nu_f + bdv * nu_b_i)
    press = jrow(_EFFM)[None, :] * p_rho2_i + flm * p_rho2_j
    grad_coef = visc - press
    if mode == "force_react":
        # fused force + fluid->boundary reaction (rigid two-way coupling):
        # fluid i accumulates its dv, boundary i the reaction force of
        # forces.rigid_reaction_kernel — ONE pass over the shared windows/
        # stream instead of two (the per-pair arithmetic of each side is
        # bit-identical to the separate sweeps; a per-i select picks the
        # row's family, and coh_i is pre-masked to fluid i in _ivals_acc0
        # so the boundary rows' cohesion term is an exact +0).
        if fast_math:
            inv_rho_j = pl.reciprocal(jnp.maximum(rho_j, 1e-12), approx=True)
        else:
            inv_rho_j = 1.0 / jnp.maximum(rho_j, 1e-12)
        nu_b_j = (params.boundary_sigma * h * params.c_s * 0.5) * inv_rho_j
        react = ivals["bvol_i"] * (flm * (nu_b_j * dot_neg - p_rho2_j))
        grad_coef = jnp.where(ivals["fl_i"] > 0.0, grad_coef, react)
    coef = jnp.where(valid, grad_coef * gmag + (coh_i * flm) * w, 0.0)
    return geom.reduce_v(coef, acc_in)


def _fin_scale(mode, k_sig, h):
    """Uniform per-pair scale deferred to the lane_acc finalizer: the
    spline normalisation for every mode, times grad W's 1/h for the
    gradient modes (whose cohesion term compensates via coh_i)."""
    return k_sig / h if mode in ("force", "reaction", "force_react") else k_sig


def _ivals_acc0(mode, dim, block, k_sig, params, irow,
                lane_acc=False, tile=None):
    """Per-i operands + initial accumulators, hoisted to the kernel
    preamble (computed ONCE per block, not per tile): includes the force
    tile's per-i viscosity/cohesion coefficients that used to cost a
    divide + multiply per (pair, tile) iteration.  Returns a dict with the
    mode's ``ivals`` plus an ``acc0`` entry the caller pops (and, for
    lane_acc force, a ``bias`` of per-axis constants the kernel adds after
    its one-per-block lane reduction — the gravity offset cannot live in a
    lane-shaped accumulator that gets summed over T lanes)."""
    h = params.support_length
    shape = (block, tile) if lane_acc else (block,)
    if mode in ("density", "bvol"):
        # self term rides IN the sweep: j = i passes the id test, W(0) =
        # k_sig, and effm_i = m_i for the fluid i the density output is
        # kept for (bd_i = 1 for the boundary i bvol keeps) — so these
        # modes need no self-exclusion test at all.
        return {"acc0": (jnp.zeros(shape, jnp.float32),)}
    if mode.startswith("probe"):
        return {"acc0": (jnp.zeros((block,), jnp.float32),)}
    if mode == "reaction":
        return {
            "vi": [irow(_V + a) for a in range(dim)],
            "bvol_i": (params.density0 * irow(_VOL))[:, None],
            "acc0": tuple(jnp.zeros(shape, jnp.float32) for _ in range(dim)),
        }
    rho_i = irow(_RHO)
    # lane_acc finalizer scales gradient-mode sums by k_sig/h (gmag's two
    # uniform factors deferred); the cohesion term has no 1/h, so it is
    # compensated with an h folded into the per-i coefficient here.
    coh_h = params.support_length if lane_acc else 1.0
    coh_i = (
        -(coh_h * params.surface_tension
          * (1.0 / jnp.maximum(irow(_M), 1e-30)))
    )
    fl_lane = irow(_FL)
    if mode == "force_react":
        # fused rigid coupling: boundary i rows accumulate the reaction
        # force instead of a fluid dv — mask the fluid-only cohesion and
        # gravity terms per i, and hoist the reaction's bvol coefficient
        coh_i = jnp.where(fl_lane > 0.0, coh_i, 0.0)
    out = {
        "rho_i": rho_i[:, None],
        "p_rho2_i": irow(_PRHO2)[:, None],
        "coh_i": coh_i[:, None],
        "nu_b_i": (
            params.boundary_sigma * h * params.c_s / (2.0 * rho_i)
        )[:, None],
        "vi": [irow(_V + a) for a in range(dim)],
    }
    if mode == "force_react":
        # f32, not bool: a [:, None] minor-dim insert on an i1 vector is a
        # tpu.reshape Mosaic cannot compile ("Insertion of minor dim that
        # is not a no-op only supported for 32-bit types"); the consumer
        # compares > 0 AFTER the broadcast instead
        out["fl_i"] = fl_lane[:, None]
        out["bvol_i"] = (params.density0 * irow(_VOL))[:, None]
    grav = [
        float(params.gravity[a]) if mode != "force_react"
        else float(params.gravity[a]) * fl_lane
        for a in range(dim)
    ]
    if lane_acc:
        out["acc0"] = tuple(
            jnp.zeros(shape, jnp.float32) for _ in range(dim)
        )
        out["bias"] = tuple(grav)
    else:
        out["acc0"] = tuple(
            jnp.broadcast_to(
                jnp.asarray(grav[a], jnp.float32), (block,)
            ).astype(jnp.float32)
            for a in range(dim)
        )
    return out


def _sweep_kernel(
    meta_ref,       # (8, 128) i32 VMEM tile; row (blk % 8) = [wstarts|wlens]
    ipack_ref,      # (16, B) VMEM — this block's particles (transposed)
    jpack_hbm,      # (16, N) ANY — full packed array
    out_ref,        # (B, 8) VMEM
    jbuf,           # (2, 16, W) VMEM scratch (double buffer)
    sem,            # DMA semaphores (2,)
    *,
    mode: str,
    spec: GridSpec,
    params: SolverParams,
    block: int,
    window: int,
    tile: int,
    fast_math: bool = True,
):
    dim = spec.dim
    h = params.support_length
    rows = spec.num_rows
    offsets = _row_offsets(spec)
    strides = np.asarray(spec.strides)
    res = np.asarray(spec.res)
    k_sig = cubic_kernel_sigma(dim, h)

    xi = [ipack_ref[_X + a, :] for a in range(dim)]  # dim x (B,)
    # integer cell coords as exact f32, per-axis scalar constants only
    ci = [
        jnp.clip(
            jnp.floor((xi[a] - float(spec.domain_start[a])) / spec.cell_size),
            0.0,
            float(res[a] - 1),
        )
        for a in range(dim)
    ]

    blk = pl.program_id(0)
    mrow = jax.lax.rem(blk, 8)

    lane_acc = mode not in ("probe", "probe_noloop")
    ivals = _ivals_acc0(mode, dim, block, k_sig, params,
                        lambda r: ipack_ref[r, :],
                        lane_acc=lane_acc, tile=tile)
    acc0 = ivals.pop("acc0")
    bias = ivals.pop("bias", None)
    vi = ivals.get("vi")

    def dma(slot, row):
        # starts are host-quantised to the lane grid; tell Mosaic so
        ws = pl.multiple_of(meta_ref[mrow, row], _LANE)
        return pltpu.make_async_copy(
            jpack_hbm.at[:, pl.ds(ws, window)], jbuf.at[slot], sem.at[slot]
        )

    dma(0, 0).start()
    acc = acc0

    for row in range(rows):  # static unroll: 9 (3D) / 3 (2D) rows
        slot = row % 2
        if row + 1 < rows:
            dma((row + 1) % 2, row + 1).start()
        dma(slot, row).wait()

        ws = meta_ref[mrow, row]
        wl = meta_ref[mrow, rows + row]

        # per-i inclusive cell-id range [c_lo, c_hi] for this stencil row
        o = offsets[row]
        valid_row = None
        base = jnp.zeros((block,), jnp.float32)
        for a in range(dim - 1):
            nb = ci[a] + float(o[a])
            va = (nb >= 0.0) & (nb < float(res[a]))
            valid_row = va if valid_row is None else (valid_row & va)
            base = base + jnp.clip(nb, 0.0, float(res[a] - 1)) * float(strides[a])
        z = ci[dim - 1]
        z_lo = jnp.maximum(z - 1.0, 0.0)
        z_hi = jnp.minimum(z + 1.0, float(res[-1] - 1))
        if valid_row is None:
            valid_row = jnp.ones((block,), jnp.bool_)
        c_lo = jnp.where(valid_row, base + z_lo, 1.0)[:, None]
        c_hi = jnp.where(valid_row, base + z_hi, 0.0)[:, None]

        def tile_body(t, acc_in, slot=slot, ws=ws, c_lo=c_lo, c_hi=c_hi):
            # one dynamic VMEM read for the whole slab, static row slices
            jslab_all = jbuf[slot, :, pl.ds(t * tile, tile)]  # (16, T)
            jrow = lambda r: jslab_all[r]  # (T,)
            if mode == "probe":
                # diagnostic: DMA + loop + one touch per lane (fixed costs)
                return (acc_in[0] + jnp.sum(jrow(_X)),) + acc_in[1:]
            idw = jrow(_ID)[None, :]

            geom = _vpu_geom(dim, xi, vi, jrow)
            # id-range test alone (see the seg kernel for why the r2
            # cutoff and window bounds are redundant).  NO self-exclusion
            # anywhere: density/bvol fold the self W(0) term into the
            # sweep (_ivals_acc0), and the gradient modes' self pair
            # contributes exactly zero — reduce_v multiplies every term by
            # dx, which is bitwise 0 for i == j (both sides load the SAME
            # packed value), while the 1e-12 rsqrt clamp keeps coef finite.
            valid = (idw >= c_lo) & (idw <= c_hi)
            return _tile_math(mode, dim, h, k_sig, params, fast_math,
                              ivals, jrow, geom, valid, acc_in)

        acc = jax.lax.fori_loop(0, pl.cdiv(wl, tile), tile_body, acc)

    if lane_acc:
        # one (B, T) -> (B,) lane reduction per accumulator per BLOCK
        # (deferred from per-tile), plus the deferred k_sig scale and the
        # per-axis bias (gravity) that cannot ride in a lane-shaped acc
        fin = _fin_scale(mode, k_sig, h)
        acc = tuple(
            jnp.sum(a, axis=1) * fin
            + (bias[c] if bias is not None else 0.0)
            for c, a in enumerate(acc)
        )
    for c, col in enumerate(acc):
        out_ref[:, c] = col
    for c in range(len(acc), out_ref.shape[1]):
        out_ref[:, c] = jnp.zeros((block,), jnp.float32)


def block_meta(
    sorted_ids: jax.Array,
    coords: jax.Array,
    spec: GridSpec,
    block: int,
    window: int,
    ids_i: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Returns ``(meta, need)``:

    - meta: (ceil8(num_blocks), 128) i32; per block, [wstarts | wlens]
      padded.  starts = searchsorted of min-over-block row c_lo
      (grid.block_window_bounds), quantised DOWN to the 128-lane grid (the
      DMA offset must be lane-aligned); lens clipped to ``window``.
    - need: () i32 — the longest QUANTISED window any block actually needs
      (before clipping).  ``need > window`` means candidates were silently
      dropped this step; SolverBase.run watches this after every dispatch.

    In the sharded setting the i side (``coords``/``ids_i``) is a sub-range
    of the halo-extended j array (``sorted_ids``); window indices are in
    j-array coordinates."""
    from tisph_tpu.ops.grid import block_window_bounds

    n_j = sorted_ids.shape[0]
    n = coords.shape[0]
    if ids_i is None:
        ids_i = sorted_ids
    num_blocks = n // block
    starts, ends = block_window_bounds(sorted_ids, coords, spec, block, ids_i=ids_i)
    starts_q = (starts // _LANE) * _LANE  # lane-aligned DMA offsets
    need = jnp.max(jnp.maximum(ends - starts_q, 0))
    starts_q = jnp.clip(starts_q, 0, max(n_j - window, 0))
    lens = jnp.clip(ends - starts_q, 0, window)
    meta = jnp.concatenate([starts_q, lens], axis=1)
    # pad to (ceil8(num_blocks), 128) for aligned (8, 128) VMEM tiles
    nb8 = int(-(-num_blocks // 8) * 8)
    meta = jnp.pad(meta, ((0, nb8 - num_blocks), (0, 128 - meta.shape[1])))
    return meta, need


def _run_sweep(pack, meta, mode, spec, params, block, window, tile, interpret,
               ipack=None, fast_math=True):
    """``ipack``: in the sharded setting the i side is a local (16, N_i)
    slice of the j array ``pack`` (its offset rides in meta col 127)."""
    if ipack is None:
        ipack = pack
    n_i = ipack.shape[1]
    num_blocks = n_i // block
    out_cols = 8
    kern = functools.partial(
        _sweep_kernel,
        mode=mode, spec=spec, params=params,
        block=block, window=min(window, pack.shape[1]), tile=tile,
        fast_math=fast_math and not interpret,  # approx recip is TPU-only
    )
    out = pl.pallas_call(
        kern,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda k: (k // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F_ROWS, block), lambda k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block, out_cols), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_i, out_cols), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, F_ROWS, min(window, pack.shape[1])), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(meta, ipack, pack)
    return out


def density_sweep(pack, meta, spec, params, block, window, tile=256,
                  interpret=False, ipack=None, fast_math=True):
    """rho_i = m_i W(0) + sum_j eff_mass_j W (fluid mask applied by caller)."""
    out = _run_sweep(pack, meta, "density", spec, params, block, window, tile,
                     interpret, ipack, fast_math)
    return out[:, 0]


def force_sweep(pack, meta, spec, params, block, window, tile=256,
                interpret=False, ipack=None, fast_math=True):
    """Fused non-pressure + pressure dv (gravity included)."""
    out = _run_sweep(pack, meta, "force", spec, params, block, window, tile,
                     interpret, ipack, fast_math)
    return out[:, : spec.dim]


# (the bvol/reaction modes are exposed only through the seg wrappers below
# — the rigid coupled step's non-seg configurations use the jnp blocked
# path, so linear-layout wrappers would be dead code)


# ---------------------------------------------------------------------------
# Seg layout: row-confined logical blocks (grid.seg_plan)
# ---------------------------------------------------------------------------

# per-block authoritative lane range [own_lo, own_hi): the lanes of the
# block's compact slab that belong to its OWN anchor (leading/overhang
# lanes compute garbage against the wrong windows); the kernel writes its
# compact output block through this mask, which replaces the former
# block-slot -> compact back-gather (~2.8 ms per output at 195k)
_OWN_LO = 125
_OWN_HI = 126


class SegMeta(NamedTuple):
    """Seg sweep metadata (see :func:`seg_block_meta`).

    ``iblk`` is the scalar-prefetch index array Mosaic's pipeline uses to
    fetch each block's i-slab; ``wblk`` feeds the kernel's MANUAL window
    DMAs (fetched one block ahead, double-buffered) — the flat tile loop
    (ONE fori_loop per block; 9 per-row loops measured ~6 ms of pure
    loop-instance overhead per sweep at 195k, probe vs probe_noloop)
    cannot index 9 separate BlockSpec window refs by a traced row."""

    meta: jax.Array  # (ceil8(block_cap), 128) i32 — per-row scalars (VMEM)
    iblk: jax.Array  # (ceil8(block_cap),) i32 — i-slab index, units of block
    wblk: jax.Array  # (ceil8(block_cap)*rows,) i32 — base of each
    #                  ``window``-lane window fetch per (block, stencil
    #                  row), in units of the 128-lane grid


def seg_block_meta(
    plan, sorted_ids: jax.Array, spec: GridSpec, block: int, window: int,
    bounds: jax.Array | None = None,
    sub: int = 1,
    own_ids: jax.Array | None = None,
) -> tuple["SegMeta", jax.Array]:
    """(SegMeta, need) for the seg layout.

    Per logical block b (grid.seg_plan) and stencil row, the candidate
    window [start, end) of one neighbor column is addressed as: a
    ``window``-lane fetch starting at the 128-aligned floor of ``start``
    (BlockSpec Element index in units of the 128-lane grid), plus lane
    bounds relative to that base.

    ``sub`` splits each block's 128·k i-lanes into ``sub`` SUB-SLABS that
    get their own (narrower) candidate ranges: sub-slab s only needs to
    cover the id span of ITS OWN lanes, so the compacted math stream per
    i shrinks toward the exact union (lane_decomposition @195k
    mid-collapse: 1147 lanes/i at sub=1, 817 at 2, 602 at 4) at the cost
    of ``sub``× compaction passes over a shared block-level window fetch.
    (The earlier "per-half sub-block windows: wash" entry predates the
    streaming compaction — 128-lane start quantisation ate the gain then;
    the rotation merge has no per-row rounding, so the lever is live.)

    meta columns:

    - cols [0, 3*rows*sub): per (sub-slab s, stencil row r) triple at
      3*(s*rows + r): [cb, dlt, t] — the true candidate range of that
      (s, r) starts at window lane cb*128 + dlt (cb = chunk base, dlt in
      [0, 128)) and holds t lanes, all relative to the row's shared
      block-level fetch base floor128(start_r)
    - col 125/126: own lane range [own_lo, own_hi) (compact output mask)

    ``need`` = longest 128-quantised BLOCK-level window any block requires
    (the fetch is block-level regardless of ``sub``); compared against
    ``window`` by SolverBase.run after every dispatch (``need > window``
    means the far end of some column was clipped this step).

    ``own_ids``: the array ``plan``'s compact rows index for the sub>1
    endpoint-id gathers — defaults to ``sorted_ids``; the sharded path
    passes its LOCAL ids (``sorted_ids`` is then the halo-extended array
    the CSR ``bounds`` were built over, whose rows are offset from the
    plan's).
    """
    n = sorted_ids.shape[0]
    window = min(window, n)  # must mirror _run_sweep_seg's effective window
    rows = spec.num_rows
    if 3 * rows * sub > _OWN_LO:
        raise ValueError(f"sub={sub} needs {3*rows*sub} meta cols > {_OWN_LO}")
    if block % sub or (block // sub) % 8:
        raise ValueError(f"block {block} not divisible into {sub} 8-aligned "
                         "sub-slabs")
    strides = np.asarray(spec.strides)
    offsets = _row_offsets(spec)
    offs = [
        int(np.dot(o, strides[: spec.dim - 1])) if spec.dim > 1 else 0
        for o in offsets
    ]

    # Candidate window per stencil offset O = o . strides[:-1]: an id span
    # [lo, hi] has offset-O targets in [lo + O - 1, hi + O + 1] (z +/- 1 in
    # flat id space), clipped into the grid.  Out-of-grid targets clip to
    # empty/superset windows; geometric validity (per-axis bounds, z
    # clamping) is the KERNEL's per-pair cell-id test — which multi-row
    # (sparse-run) blocks need anyway to keep adjacent offsets'
    # overlapping windows from double counting.
    def _q(id_lo, id_hi, active):
        lo_l, hi_l = [], []
        for off in offs:
            lo = jnp.clip(id_lo + off - 1, 0, spec.num_cells)
            hi = jnp.clip(id_hi + off + 1, -1, spec.num_cells - 1)
            lo_l.append(jnp.where(active, lo, spec.num_cells))
            hi_l.append(jnp.where(active, hi, -1))
        return jnp.stack(lo_l, axis=-1), jnp.stack(hi_l, axis=-1)

    # CSR-bounds gathers instead of searchsorted: ~3x cheaper on the v5e
    # (grid.csr_bounds_hist; the bounds are shared with seg_plan when the
    # caller builds them once per rebuild)
    if bounds is None:
        from tisph_tpu.ops.grid import csr_bounds_hist

        bounds = csr_bounds_hist(sorted_ids, spec)

    def _se(q_lo, q_hi):
        starts = bounds[jnp.clip(q_lo, 0, spec.num_cells)].astype(jnp.int32)
        ends = bounds[jnp.clip(q_hi + 1, 0, spec.num_cells)].astype(jnp.int32)
        return starts, ends

    # block-level union window: the shared per-row fetch + overflow check
    act = plan.seg_len > 0
    q_lo, q_hi = _q(plan.id_first, plan.id_last, act)   # (block_cap, rows)
    starts, ends = _se(q_lo, q_hi)
    ws128 = (starts // _LANE) * _LANE  # floor128(start): the fetch base
    need = jnp.max(jnp.maximum(ends - ws128, 0))
    # fetch index in units of the 128-lane grid; the index map multiplies
    # by _LANE so Mosaic can prove the element offset is lane-aligned.
    # Fetching exactly ``window`` lanes from the quantised start (instead
    # of 2*window from a window-aligned base) halves the window DMA bytes.
    wblk = ws128 // _LANE

    # per-sub-slab ranges: sub s must cover the ids of its OWN lanes
    # [max(own_lo, s*ss), min(own_hi, (s+1)*ss)) — lane l of block b is
    # compact row seg_start[b] - own_lo... no: seg_start is the 128-aligned
    # block start, so lane l <-> compact row seg_start + l.  Endpoint ids
    # come straight from the sorted id array (own lanes are always active).
    if sub == 1:
        a_rel = jnp.clip(starts - ws128, 0, window)[:, None, :]
        e_rel = jnp.clip(ends - ws128, 0, window)[:, None, :]
    else:
        ss = block // sub
        s_ix = jnp.arange(sub, dtype=jnp.int32)
        own_hi = (plan.own_lo + plan.seg_len).astype(jnp.int32)
        lo_l = jnp.maximum(plan.own_lo[:, None].astype(jnp.int32),
                           s_ix[None, :] * ss)          # (block_cap, sub)
        hi_l = jnp.minimum(own_hi[:, None], (s_ix[None, :] + 1) * ss)
        act_s = act[:, None] & (hi_l > lo_l)
        oids = sorted_ids if own_ids is None else own_ids
        n_own = oids.shape[0]
        row0 = plan.seg_start[:, None].astype(jnp.int32)
        id_lo = oids[jnp.clip(row0 + lo_l, 0, n_own - 1)].astype(jnp.int32)
        id_hi = oids[
            jnp.clip(row0 + hi_l - 1, 0, n_own - 1)
        ].astype(jnp.int32)
        id_lo = jnp.minimum(id_lo, spec.num_cells - 1)
        id_hi = jnp.minimum(id_hi, spec.num_cells - 1)
        q_lo_s, q_hi_s = _q(id_lo, id_hi, act_s)  # (block_cap, sub, rows)
        starts_s, ends_s = _se(q_lo_s, q_hi_s)
        a_rel = jnp.clip(starts_s - ws128[:, None, :], 0, window)
        e_rel = jnp.clip(ends_s - ws128[:, None, :], 0, window)
    t_sr = jnp.maximum(e_rel - a_rel, 0)
    triple = jnp.stack([a_rel // _LANE, a_rel % _LANE, t_sr], axis=-1)

    block_cap = plan.seg_start.shape[0]
    meta = jnp.zeros((block_cap, 128), jnp.int32)
    meta = (
        meta.at[:, : 3 * rows * sub].set(triple.reshape(block_cap, -1))
        .at[:, _OWN_LO].set(plan.own_lo.astype(jnp.int32))
        .at[:, _OWN_HI].set(
            (plan.own_lo + plan.seg_len).astype(jnp.int32)
        )
    )
    nb8 = int(-(-block_cap // 8) * 8)
    meta = jnp.pad(meta, ((0, nb8 - block_cap), (0, 0)))
    # iblk pads with the LAST value, not 0: the compact-output write
    # revisits out block iblk[k] and relies on equal-iblk runs being
    # CONSECUTIVE (Mosaic keeps the block in VMEM across them); zero-pad
    # would revisit out block 0 non-consecutively and flush garbage over
    # its real values.  seg_plan guarantees monotone seg_start, so
    # edge-padding preserves the invariant.
    iblk = jnp.pad(plan.seg_start // block, (0, nb8 - block_cap), mode="edge")
    wblk = jnp.pad(wblk, ((0, nb8 - block_cap), (0, 0))).reshape(-1)
    return SegMeta(meta=meta, iblk=iblk, wblk=wblk), need


def _seg_sweep_kernel(
    iblk_ref,       # (ceil8(block_cap),) i32 SMEM — i-slab indices (prefetch)
    wblk_ref,       # (ceil8(block_cap)*rows,) i32 SMEM — window fetch bases
    *refs,          # [act_ref (skippable only),] meta_ref, ipack_ref,
    #                 jpack_hbm, out_ref, jbuf, sems, cbuf — see below
    mode: str,
    spec: GridSpec,
    params: SolverParams,
    block: int,
    window: int,
    tile: int,
    fast_math: bool = True,
    sub: int = 1,
    with_bias: bool = True,
    skippable: bool = False,
):
    """Seg-layout sweep over anchor-confined logical blocks (grid.seg_plan:
    dense rows get their own z-trimmed blocks; sparse-row runs share
    multi-row blocks).  Membership is the per-pair cell-id test alone (each
    j must lie in THIS stencil offset's cell range of its i — computed from
    sort-time ids on both sides, so the structure stays consistent under
    resort_every amortization); the spline clamps make the r2 < h^2 cutoff
    exact, and NO mode needs a self-pair test (density/bvol fold the self
    W(0) term in; the gradient modes' self pair contributes exactly zero
    because reduce_v multiplies by dx, bitwise 0 for i == j, with coef
    kept finite by the rsqrt clamp).

    Loop structure (round 3, v3 — concat-compaction): after the window
    DMAs land, a per-block COMPACTION pass copies each row's occupied
    128-lane chunks back-to-back into ``cbuf`` (one dense stream), and
    rewrites each chunk's id lane as  id - o_off(row)  where
    o_off = sum_a offset_a * stride_a  is the i-independent part of the
    row's cell range.  The math loop then runs over ceil(nch*128/tile)
    DENSE tiles with NO per-row logic at all: membership is the separable
    test  (id_j - o_off) in [lo_i, hi_i]  with per-i bounds hoisted to
    the preamble (lo_i = id_i - min(z,1), hi_i = id_i + min(rz-1-z, 1)).
    Separability at grid edges is exact because GridSpec.strides pads
    each inner non-z axis by one gap row, so out-of-grid offsets alias
    only EMPTY id space (see GridSpec.strides).  Versus the per-row tile
    loop this cuts the processed lanes from the per-row tile-rounded sum
    (~4255/i at 195k mid-collapse) to the chunk-rounded sum (~2900/i) —
    the sweep is vector-throughput-bound, so lanes are time.

    Window data moves by MANUAL double-buffered DMA, one block ahead:
    while block k computes from slot k%2, block k+1's ``rows`` window
    fetches stream into the other slot.

    Overlap/overhang i-lanes (neighboring anchors' particles at the block's
    edges) compute garbage that the caller's back map discards.

    ``skippable``: an extra (ceil8(block_cap),) i32 scalar-prefetch operand
    ``act_ref`` follows wblk_ref; blocks with act == 0 skip their window
    DMAs (start AND wait are gated by the same scalar, so semaphore
    pairing stays exact under any skip pattern), run the compaction and
    math loops for zero iterations, and leave their out lanes unwritten —
    garbage the caller masks exactly like back-map-invalid lanes.  Used by
    the bvol sweep to process only blocks whose i-slab holds a boundary
    particle (rigid scenes are ~99% fluid rows the bvol output never
    consumes)."""
    if skippable:
        act_ref, meta_ref, ipack_ref, jpack_hbm, out_ref, jbuf, sems, cbuf = refs
    else:
        meta_ref, ipack_ref, jpack_hbm, out_ref, jbuf, sems, cbuf = refs
    # refs: meta (8,128) i32 VMEM tile row (blk%8); ipack (FR, B) VMEM
    # i-slab (pipelined via the iblk prefetch index map); jpack (FR,
    # N_padded) ANY (manual DMA src; FR = 8 for density/bvol, 16 for the
    # gradient modes); out (B, 8) VMEM; jbuf (2, rows, FR, W) VMEM window
    # double buffer; sems (2, rows) DMA semaphores; cbuf (FR,
    # ~sub*rows*W) VMEM compacted window streams (dynamic bases)
    rows = spec.num_rows
    dim = spec.dim
    h = params.support_length
    k_sig = cubic_kernel_sigma(dim, h)
    res = np.asarray(spec.res)
    strides = np.asarray(spec.strides)
    offsets = _row_offsets(spec)

    blk = pl.program_id(0)
    nblk = pl.num_programs(0)
    mrow = jax.lax.rem(blk, 8)
    slot = jax.lax.rem(blk, 2)

    def dma(s, row, b):
        ws = pl.multiple_of(wblk_ref[b * rows + row] * _LANE, _LANE)
        return pltpu.make_async_copy(
            jpack_hbm.at[:, pl.ds(ws, jbuf.shape[3])],
            jbuf.at[s, row],
            sems.at[s, row],
        )

    if skippable:
        act_me = act_ref[blk] != 0
        # clamped read: on the last block the guard below is false, but the
        # condition operand is still evaluated
        act_next = act_ref[jnp.minimum(blk + 1, nblk - 1)] != 0
    else:
        act_me = act_next = True

    @pl.when((blk == 0) & act_me if skippable else blk == 0)
    def _():
        for r in range(rows):
            dma(0, r, 0).start()

    # prefetch the NEXT block's windows before waiting on our own (start
    # and wait are both gated by the TARGET block's act scalar, so every
    # started DMA is waited exactly once under any skip pattern)
    @pl.when((blk + 1 < nblk) & act_next if skippable else blk + 1 < nblk)
    def _():
        for r in range(rows):
            dma(1 - slot, r, blk + 1).start()

    lane_acc = not mode.startswith("probe")
    if sub != 1 and mode.startswith("probe"):
        raise NotImplementedError("probe modes require sub=1")
    ss = block // sub
    res_z = float(int(res[-1]))
    # i-independent row offsets o . strides[:-1] (static constants)
    o_offs = [
        float(np.dot(o, strides[: dim - 1])) if dim > 1 else 0.0
        for o in offsets
    ]

    if skippable:
        @pl.when(act_me)
        def _():
            for r in range(rows):
                dma(slot, r, blk).wait()
    else:
        for r in range(rows):
            dma(slot, r, blk).wait()

    # ---- compaction: stream each (sub-slab, row)'s occupied TRUE range
    # into that sub-slab's region of cbuf back-to-back with NO rounding at
    # all — each source chunk is rotated so its true start lands at the
    # stream's running dest position and merged into the two dest chunks
    # it straddles.  Junk lanes that survive anywhere (row-tail overrun,
    # never-written tail) are INERT: beyond-range lanes hold real
    # particles whose ids exceed the sub-slab's CSR end, so their shifted
    # id exceeds every OWN hi_i of the sub-slab (non-own lanes are garbage
    # the caller masks anyway); zero-pad lanes carry zero mass/material;
    # unwritten lanes keep the sentinel id. ----
    cumc = [jnp.int32(0)]   # source 128-chunk cumsum over (sub, row) entries
    cbs, dlts, dsts = [], [], []
    nl = []                 # per-sub true lane count
    base_s = [jnp.int32(0)]  # per-sub stream base (128-aligned by constr.)
    for s in range(sub):
        cum_s = jnp.int32(0)
        for r in range(rows):
            c = 3 * (s * rows + r)
            cbs.append(meta_ref[mrow, c])
            dlts.append(meta_ref[mrow, c + 1])
            t_sr = meta_ref[mrow, c + 2]
            dsts.append(base_s[s] + cum_s)
            cumc.append(cumc[-1] + pl.cdiv(t_sr, _LANE))
            cum_s = cum_s + t_sr
        nl.append(cum_s)
        # next stream starts past this one's tail-fill region
        # [floor128(nl), +tile+128), kept on the 128 grid (every term is a
        # multiple of 128; the hint lets Mosaic prove the tile loop's
        # B_s + t*tile loads aligned — it cannot see through cdiv)
        base_s.append(pl.multiple_of(
            base_s[s] + pl.cdiv(cum_s, _LANE) * _LANE + tile + _LANE, _LANE
        ))
    nch = cumc[-1]
    if skippable:
        # zero trip counts on skipped blocks: compaction and math loops
        # run no iterations; the straight-line preamble (sentinel fills,
        # per-i reads) is a few µs of harmless work on garbage
        nch = jnp.where(act_me, nch, 0)
    # sentinel-fill the id lane so tile-rounding tail lanes fail the test
    cbuf[_ID, :] = jnp.full((cbuf.shape[1],), -3e9, jnp.float32)
    # Tail lanes in [nl + last-row overrun, ceil_tile(nl)) of each stream
    # are never written by the chunk loop, and the sentinel id alone is
    # NOT enough to neutralise them: reduce_v multiplies the where-masked
    # coef by dx, and scratch garbage can be non-finite (0 * inf = NaN
    # poisons the whole block's accumulators).  Pre-fill each stream's
    # possible tail region [floor128(nl), +tile+128) with FINITE zeros
    # (sentinel in the id row); the chunk loop overwrites the real prefix.
    rowi = jax.lax.broadcasted_iota(jnp.int32, (cbuf.shape[0], _LANE), 0)
    fill = jnp.where(rowi == _ID, -3e9, 0.0)
    for s in range(sub):
        tail0 = pl.multiple_of(
            base_s[s] + nl[s] - jax.lax.rem(nl[s], jnp.int32(_LANE)), _LANE
        )
        for c in range(tile // _LANE + 1):
            cbuf[:, pl.ds(tail0 + c * _LANE, _LANE)] = fill
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    rowi2 = jax.lax.broadcasted_iota(jnp.int32, (cbuf.shape[0], 2 * _LANE), 0)

    def _chunk(k):
        """Rotated double-chunk + dest indices for source chunk k.  Reads
        jbuf/meta only (never cbuf).  All indices stay in-bounds for any
        k in [0, max(nch, 1))."""
        if mode == "probe_flat":
            # diagnostic: same chunk count + vector ops, NO scalar select
            # chain — separates the compaction's scalar vs vector cost.
            # Source/dest indices are bounds-clamped dummies (cost only).
            r, off = 0, jnp.float32(0.0)
            delta, cum, cb = dlts[0], jnp.int32(0), jnp.int32(0)
            base = k - jax.lax.rem(k, jnp.int32(jbuf.shape[3] // _LANE - 2))
        else:
            r = jnp.int32(0)
            base = jnp.int32(0)
            off = jnp.float32(o_offs[0])
            delta = dlts[0]
            cb = cbs[0]
            cum = dsts[0]
            for j in range(1, sub * rows):  # scalar select chain
                cj = k >= cumc[j]
                r = jnp.where(cj, j % rows, r)
                base = jnp.where(cj, cumc[j], base)
                off = jnp.where(cj, jnp.float32(o_offs[j % rows]), off)
                delta = jnp.where(cj, dlts[j], delta)
                cb = jnp.where(cj, cbs[j], cb)
                cum = jnp.where(cj, dsts[j], cum)
        j128 = k - base
        m = jax.lax.rem(cum, jnp.int32(_LANE))  # entry's dest misalignment
        # Mosaic requires 128-aligned lane loads: read the aligned
        # double-chunk and rotate so source lane ((cb+j128)*128 + delta+l)
        # lands at rotated position m + l.  The fetch is padded +256
        # lanes so the last double-chunk stays inside DMA'd data.
        wide = jbuf[slot, r, :, pl.ds((cb + j128) * _LANE, 2 * _LANE)]
        if mode == "probe_noroll":
            # diagnostic: full compaction minus ONLY the dynamic roll —
            # isolates the roll butterfly's share of the chunk cost
            rw = wide
        else:
            rw = pltpu.roll(wide, shift=m - delta, axis=1)
        # fold the row offset into the id lane via a row-iota select:
        # value-level .at[].set emits a `scatter`, which Mosaic cannot
        # lower inside the fori body (only caught on real-TPU compile)
        rw = jnp.where(rowi2 == _ID, rw - off, rw)
        # dest CHUNK index (m = cum mod 128, so cum - m is a multiple of
        # 128); returned in chunk units — the merge re-multiplies by
        # _LANE, which Mosaic can prove 128-aligned
        dest_c = ((cum - m) + j128 * _LANE) // _LANE
        return rw, dest_c, m

    def _merge(rw, dest_c, m):
        dest = pl.multiple_of(dest_c * _LANE, _LANE)
        d1 = cbuf[:, pl.ds(dest, _LANE)]
        cbuf[:, pl.ds(dest, _LANE)] = jnp.where(
            lane128 >= m, rw[:, :_LANE], d1
        )
        d2 = cbuf[:, pl.ds(dest + _LANE, _LANE)]
        cbuf[:, pl.ds(dest + _LANE, _LANE)] = jnp.where(
            lane128 < m, rw[:, _LANE:], d2
        )

    # One chunk per iteration.  Scheduling levers measured DEAD on the
    # v5e (round 3): carrying chunk k+1's rotation in the loop carry and
    # 4-way unrolling with independent _chunk() rotations both left
    # probe_noloop unchanged (~5.5 ms) — Mosaic does not overlap the
    # roll-butterfly latencies across chunk bodies, so the per-chunk cost
    # (~54 cycles of dependent roll + RMW merge) is not schedulable away.

    def ch_body(k, carry):
        _merge(*_chunk(k))
        return carry

    if mode != "probe_nocompact":  # diagnostic: DMA-only fixed cost
        jax.lax.fori_loop(0, nch, ch_body, jnp.int32(0))

    # ---- math: one dense tile loop per sub-slab over ITS stream.  All
    # per-i operands are static sub_sz-lane slices of the i-slab; with
    # sub=1 this degenerates to the single block-level loop. ----
    sub_accs = []
    for s in range(sub):
        irow = lambda rr, s=s: ipack_ref[rr, s * ss:(s + 1) * ss]  # (ss,)
        xi = [irow(_X + a) for a in range(dim)]
        # z (fastest-axis cell coord) decoded from the packed id row
        # (i32-exact: num_cells < 2^24 is enforced at bind)
        zi = jax.lax.rem(
            irow(_ID).astype(jnp.int32), jnp.int32(int(strides[-2]))
        ) if dim > 1 else irow(_ID).astype(jnp.int32)
        ivals = _ivals_acc0(mode, dim, ss, k_sig, params, irow,
                            lane_acc=lane_acc, tile=tile)
        acc0 = ivals.pop("acc0")
        bias = ivals.pop("bias", None)
        vi = ivals.get("vi")
        # separable per-i membership bounds (see docstring): the row-offset
        # part of the cell range is folded into the j ids at compaction
        # time, so each i only needs its own z-clamped [lo, hi] — f32-exact
        idf = irow(_ID)
        zf = zi.astype(jnp.float32)
        lo_i = (idf - jnp.minimum(zf, 1.0))[:, None]
        hi_i = (idf + jnp.minimum(res_z - 1.0 - zf, 1.0))[:, None]
        B_s, ntot = base_s[s], pl.cdiv(nl[s], tile)
        if skippable:
            ntot = jnp.where(act_me, ntot, 0)

        def tile_body(t, acc_in, B_s=B_s, xi=xi, vi=vi, ivals=ivals,
                      lo_i=lo_i, hi_i=hi_i):
            jslab_all = cbuf[:, pl.ds(B_s + t * tile, tile)]  # (FR, T)
            jrow = lambda rr: jslab_all[rr]  # (T,) static slice
            if mode == "probe":
                # diagnostic: fetch + compaction + loop + one vector touch
                # — measures the sweep's fixed costs without pair math
                return (acc_in[0] + jslab_all[_X, 0:128],) + acc_in[1:]
            idw = jrow(_ID)[None, :]

            geom = _vpu_geom(dim, xi, vi, jrow)
            # Membership is the shifted id-range test ALONE: it assigns
            # every j to exactly ONE stencil offset per i (cell ranges of
            # different offsets are disjoint cells — including at grid
            # edges, thanks to the gap-padded strides), so no pair
            # double-counts even when a multi-row block's adjacent-offset
            # windows overlap or a j was copied into several segments.
            # Window bounds are subsumed by it — each stream's row ranges
            # ARE the CSR bounds of the sub-slab's id range,
            # quantisation-spill/overrun lanes hold real particles whose
            # shifted ids fall outside every own lane's [lo_i, hi_i],
            # zero-padding lanes carry zero mass/material flags so every
            # mode's contribution vanishes there, and tile-rounding tail
            # lanes carry the -3e9 sentinel id.  The r2 < h^2 cutoff is
            # exact in the spline clamps (W and dW/dq are exactly 0 for
            # q >= 1).  No self-pair test in ANY mode: density/bvol fold
            # the self W(0) term into the sweep, and the gradient modes'
            # self pair contributes exactly zero (reduce_v multiplies by
            # dx, bitwise 0 for i == j; coef stays finite via the rsqrt
            # clamp).
            valid = (idw >= lo_i) & (idw <= hi_i)
            return _tile_math(mode, dim, h, k_sig, params, fast_math,
                              ivals, jrow, geom, valid, acc_in)

        if mode in ("probe_noloop", "probe_nocompact", "probe16",
                    "probe_flat", "probe_noroll"):
            acc = (acc0[0] + jbuf[slot, 0, _X, 0:128],) + acc0[1:]
        else:
            acc = jax.lax.fori_loop(0, ntot, tile_body, acc0)
        if lane_acc:
            # one (ss, T) -> (ss,) lane reduction per accumulator per
            # sub-slab (deferred from per-tile), plus the deferred k_sig
            # scale and the per-axis bias (gravity) that cannot ride in a
            # lane-shaped acc.  ``with_bias=False`` on the q>0 passes of a
            # window-segmented sweep (_run_sweep_seg): the pass outputs are
            # SUMMED, so the per-i constant must ride exactly one pass.
            fin = _fin_scale(mode, k_sig, h)
            acc = tuple(
                jnp.sum(a, axis=1) * fin
                + (bias[c] if bias is not None and with_bias else 0.0)
                for c, a in enumerate(acc)
            )
        sub_accs.append(acc)

    # COMPACT output: this block's out tile is compact rows
    # [iblk*block, +block); only the authoritative lanes [own_lo, own_hi)
    # (this block's own anchor range) are written, the rest keep whatever
    # the out buffer holds — the overlapping block of the SAME compact
    # slab (consecutive in the grid, so the tile stays resident in VMEM)
    # fills its own lanes, and lanes no block owns (inactive tail) are
    # garbage the caller masks with SegPlan.back_valid.  This replaces
    # the block-slot -> compact back-gather entirely.
    # Each sub-slab writes its OWN static sublane slice [s*ss, (s+1)*ss)
    # — concatenating the per-sub accumulator vectors along the lane
    # axis instead hit a Mosaic backend limitation at block=256
    # (tpu.concatenate "input offsets outside of the first tile").
    ncols = out_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (ss, 1), 0)
    for s, acc in enumerate(sub_accs):
        own = ((lane + s * ss) >= meta_ref[mrow, _OWN_LO]) & (
            (lane + s * ss) < meta_ref[mrow, _OWN_HI]
        )
        if skippable:
            # skipped blocks leave their own lanes unwritten (garbage the
            # caller masks — no row of a skipped block passes its bd test)
            own = own & act_me
        new = jnp.concatenate(
            [col[:, None] for col in acc]
            + [jnp.zeros((ss, ncols - len(acc)), jnp.float32)],
            axis=1,
        )
        out_ref[s * ss:(s + 1) * ss, :] = jnp.where(
            own, new, out_ref[s * ss:(s + 1) * ss, :]
        )


def _run_sweep_seg(pack, meta: "SegMeta", mode, spec, params, block, window,
                   tile, interpret, fast_math=True, sub=1, active=None,
                   ipack=None):
    """``active``: optional (num_blocks,) i32 — blocks with 0 skip their
    DMAs and loops entirely and leave their out lanes as garbage (see
    _seg_sweep_kernel ``skippable``); callers must consume the output only
    on rows of active blocks.

    ``ipack``: optional separate (16, N_i) i-side pack.  By default the
    i-slabs are block slices of ``pack`` itself (meta.iblk in j
    coordinates — the 1-D sharded path's offset trick).  The 2-D sharded
    path passes its LOCAL pack here: own rows interleave with halo rows in
    the id-merged extended j array, so they are not contiguous there;
    meta.iblk is then in LOCAL (ipack) coordinates, the compact output has
    N_i rows, and the self-pair zero (dx bitwise 0) still holds because
    the own rows' values in ipack and the extended pack are copies of the
    same f32 values."""
    n = pack.shape[1]
    n_i = ipack.shape[1] if ipack is not None else n
    rows = spec.num_rows
    # density/bvol touch only pack rows [0, 8): fetch half-height windows
    f_rows = (D_ROWS if mode not in ("force", "reaction", "force_react",
                                     "probe16")
              else F_ROWS)
    if pack.shape[0] > f_rows:
        pack = pack[:f_rows]
    num_blocks = meta.meta.shape[0]  # ceil8(block_cap); padded rows no-op
    out_cols = 8
    # pad the j array so every window fetch stays in bounds: fetches read
    # [wblk*128, wblk*128 + W_f) with wblk*128 <= ceil128(n), i-slabs read
    # [iblk*block, +block) with iblk <= floor((n-1)/block).  The fetch
    # width is rounded UP to a tile multiple: w_eff = min(window, n) may
    # not be one (window_cap can exceed a small capacity), and the last
    # tile's dynamic slice must not read past the window plane.
    w_eff = min(window, n)
    w_fetch = -(-w_eff // tile) * tile
    # VMEM feasibility: jbuf + cbuf scale linearly with the fetch width,
    # and the adaptive window regrow (SolverBase.run) can push window_cap
    # past what one pass fits in scoped VMEM (observed: the 10k-step soak's
    # collapse spike grew the cap to 11008 lanes, where jbuf + cbuf =
    # 18.5 MiB > the 16 MiB Mosaic limit).  Serve oversized caps with
    # nseg SEGMENT PASSES: pass q shifts every per-row fetch base by
    # q*S lanes and clips each (block, row) true-lane count to its
    # [q*S, q*S + S) sub-range, and the pass outputs are summed — an exact
    # partition of the pair set (intermediate passes have 128-multiple
    # lane counts, so the compaction's tail-overrun lanes — which hold
    # real next-segment candidates — occur only on the FINAL segment,
    # where they are past the range end and inert as in the single pass).
    # Gravity rides pass 0 only (with_bias).
    s_pass = _seg_pass_lanes(rows, f_rows, sub, tile)
    nseg = max(1, -(-w_fetch // s_pass))
    if nseg > 1 and sub != 1:
        # sub>1 stores sub-slab ranges relative to the BLOCK-level fetch
        # base (cb can exceed a segment's fetch) — dead perf lever, not
        # worth the segmented variant
        raise NotImplementedError(
            f"window_cap {window} needs {nseg} VMEM segments; sub>1 "
            "supports single-pass windows only"
        )
    if nseg > 1:
        w_fetch = s_pass
        w_eff = min(w_eff, s_pass)
    # +256: the compaction's rolled double-chunk reads (aligned start
    # k*128, width 256, rotated by delta in [0, 128)) may overrun the
    # window end by up to two chunks — the extra fetched lanes are real
    # pack data or zero padding, never uninitialised VMEM
    w_dma = w_fetch + 2 * _LANE
    padded = -(-n // _LANE) * _LANE + (nseg - 1) * w_fetch + w_dma
    pack_j = jnp.pad(pack, ((0, 0), (0, padded - n)))
    if ipack is None:
        pack_i = pack_j
    else:
        pack_i = ipack[:f_rows] if ipack.shape[0] > f_rows else ipack
        pad_i = -(-n_i // block) * block - n_i
        if pad_i:
            pack_i = jnp.pad(pack_i, ((0, 0), (0, pad_i)))
    # true-lane-count columns: triple slot 2 of every (sub-slab, row) entry
    tcols = np.asarray(
        [3 * e + 2 for e in range(sub * rows)], dtype=np.int32
    )

    def one_pass(q: int):
        if nseg == 1:
            meta_q, wblk_q = meta.meta, meta.wblk
        else:
            mm = meta.meta
            meta_q = mm.at[:, tcols].set(
                jnp.clip(mm[:, tcols] - q * w_fetch, 0, w_fetch)
            )
            wblk_q = meta.wblk + q * (w_fetch // _LANE)
        kern = functools.partial(
            _seg_sweep_kernel,
            mode=mode, spec=spec, params=params,
            block=block, window=w_eff, tile=tile,
            fast_math=fast_math and not interpret,
            sub=sub, with_bias=(q == 0),
            skippable=active is not None,
        )
        if active is not None:
            n_pref = 3
            pref = (meta.iblk, wblk_q,
                    jnp.pad(active.astype(jnp.int32),
                            (0, num_blocks - active.shape[0])))
            imap_meta = lambda k, iblk, wblk, act: (k // 8, 0)
            imap_ipack = lambda k, iblk, wblk, act: (0, iblk[k])
            imap_out = lambda k, iblk, wblk, act: (iblk[k], 0)
        else:
            n_pref = 2
            pref = (meta.iblk, wblk_q)
            imap_meta = lambda k, iblk, wblk: (k // 8, 0)
            imap_ipack = lambda k, iblk, wblk: (0, iblk[k])
            imap_out = lambda k, iblk, wblk: (iblk[k], 0)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=n_pref,
                grid=(num_blocks,),
                in_specs=[
                    pl.BlockSpec((8, 128), imap_meta,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((f_rows, block), imap_ipack,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                # COMPACT output: block k writes compact rows [iblk[k]*block,
                # +block) through its own-lane mask.  Equal-iblk runs are
                # consecutive (seg_plan monotone seg_start + edge-padded
                # iblk), so Mosaic keeps the revisited out tile in VMEM and
                # the read-modify-write merge in the kernel is sound.
                out_specs=pl.BlockSpec((block, out_cols), imap_out,
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, rows, f_rows, w_dma), jnp.float32),
                    pltpu.SemaphoreType.DMA((2, rows)),
                    # One compacted stream region per sub-slab, at dynamic
                    # 128-aligned bases base_s[s+1] = base_s[s] +
                    # ceil128(nl_s) + tile + 128.  Per stream: true lanes
                    # nl_s <= rows * window (each (s, r) range is clipped to
                    # the block fetch), the masked double-chunk merge writes
                    # reach at most nl_s + 255 < ceil128(nl_s) + tile + 128
                    # past the base, the finite tail pre-fill covers
                    # [floor128(nl_s), +tile+128), and the tile loop never
                    # reads past ceil_tile(nl_s) — all within the next base.
                    pltpu.VMEM(
                        (f_rows,
                         sub * (rows * w_fetch + tile + 2 * _LANE)),
                        jnp.float32,
                    ),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct(
                (-(-n_i // block) * block, out_cols), jnp.float32
            ),
            interpret=interpret,
        )(*pref, meta_q, pack_i, pack_j)

    out = one_pass(0)
    for q in range(1, nseg):
        # non-own lanes sum pass garbage; callers mask them (back_valid)
        out = out + one_pass(q)
    return out[:n_i]


def density_sweep_seg(pack, meta: "SegMeta", spec, params, block, window,
                      tile=256, interpret=False, fast_math=True, sub=1,
                      active=None, ipack=None):
    """Seg-layout density sweep; COMPACT (n,) output — valid where
    SegPlan.back_valid (lanes no block owns hold garbage; with ``active``
    flags, only on rows of active blocks — consumers mask with the fluid
    row family, see active_blocks)."""
    out = _run_sweep_seg(pack, meta, "density", spec, params,
                         block, window, tile, interpret, fast_math,
                         sub=sub, active=active, ipack=ipack)
    return out[:, 0]


def force_sweep_seg(pack, meta: "SegMeta", spec, params, block, window,
                    tile=256, interpret=False, fast_math=True, sub=1,
                    active=None, ipack=None):
    """Seg-layout fused force sweep; COMPACT (n, dim) output — valid
    where SegPlan.back_valid (with ``active``: on active-block rows
    only — consumers mask with the fluid row family)."""
    out = _run_sweep_seg(pack, meta, "force", spec, params,
                         block, window, tile, interpret, fast_math,
                         sub=sub, active=active, ipack=ipack)
    return out[:, : spec.dim]


def bvol_sweep_seg(pack, meta: "SegMeta", spec, params, block, window,
                   tile=256, interpret=False, fast_math=True, sub=1,
                   active=None, ipack=None):
    """Seg-layout boundary-volume denominator; COMPACT (n,) output —
    valid where SegPlan.back_valid (AND, when ``active`` block flags are
    given, only on rows of active blocks — callers consume bvol on
    boundary rows only, and bvol_active_blocks marks every block whose
    i-slab holds one)."""
    out = _run_sweep_seg(pack, meta, "bvol", spec, params,
                         block, window, tile, interpret, fast_math,
                         sub=sub, active=active, ipack=ipack)
    return out[:, 0]


def active_blocks(pack, meta: "SegMeta", block: int,
                  rows: tuple = (_BD,)) -> jax.Array:
    """(num_blocks,) i32 flags for a seg sweep's ``active``: 1 iff the seg
    block's i-slab [iblk*block, +block) holds a row with pack[r] > 0 for
    any r in ``rows``.  EXACT whenever the sweep's output is consumed only
    on such rows (every consumer masks with back_valid & its row family):
    bvol on boundary rows (rows=(_BD,)), density/force on fluid rows
    (rows=(_FL,)), force_react on fluid|boundary rows (rows=(_FL, _BD)).
    Constant within an R-group (material and sorted order don't change
    between rebuilds), cheap enough to recompute per substep (one (n,)
    compare + reshape-any + gather over ~1e3 blocks).  Measured: the bvol
    skip cut the rigid coupled step 4.61 -> 5.42e6 pps at 1.1% boundary
    rows."""
    m = pack[rows[0]] > 0.0
    for r in rows[1:]:
        m = m | (pack[r] > 0.0)
    nb = -(-pack.shape[1] // block)
    mp = jnp.pad(m, (0, nb * block - pack.shape[1]))
    slab_any = jnp.any(mp.reshape(nb, block), axis=1)
    return jnp.take(slab_any, meta.iblk, fill_value=False).astype(jnp.int32)


def bvol_active_blocks(pack, meta: "SegMeta", block: int) -> jax.Array:
    """active_blocks for the bvol sweep (boundary rows only)."""
    return active_blocks(pack, meta, block, rows=(_BD,))


def reaction_sweep_seg(pack, meta: "SegMeta", spec, params, block, window,
                       tile=256, interpret=False, fast_math=True, sub=1,
                       ipack=None):
    """Seg-layout fluid->boundary reaction force; COMPACT (n, dim)
    output — valid where SegPlan.back_valid."""
    out = _run_sweep_seg(pack, meta, "reaction", spec, params,
                         block, window, tile, interpret, fast_math,
                         sub=sub, ipack=ipack)
    return out[:, : spec.dim]


def force_react_sweep_seg(pack, meta: "SegMeta", spec, params, block, window,
                          tile=256, interpret=False, fast_math=True, sub=1,
                          active=None, ipack=None):
    """Fused force + reaction (rigid two-way coupling) in ONE seg pass:
    COMPACT (n, dim) output holding the fluid dv on fluid rows and the
    fluid->boundary reaction force on boundary rows (valid where
    SegPlan.back_valid; callers split by material mask — with ``active``
    flags use the fluid|boundary row family).  Per-pair arithmetic is
    bit-identical to force_sweep_seg / reaction_sweep_seg — the fusion
    halves the coupled step's window fetch + compaction work (VERDICT r3
    weak #6)."""
    out = _run_sweep_seg(pack, meta, "force_react", spec, params,
                         block, window, tile, interpret, fast_math,
                         sub=sub, active=active, ipack=ipack)
    return out[:, : spec.dim]
