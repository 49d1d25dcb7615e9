"""Microbenchmark the seg rebuild's metadata pieces on the real TPU:
which primitive is actually slow (searchsorted-scan vs sort-based vs
histogram+cumsum CSR), and the per-op cost of seg_plan / seg_block_meta.

    PYTHONPATH=.:/root/.axon_site python tools/microbench_meta.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import tisph_tpu as tt
from tisph_tpu.ops import grid as gridops
from tisph_tpu.ops.pallas import sweeps as ps


def timeit(fn, args, reps=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    scene = tt.load_scene("scenes/demo_3d.json")
    solver = tt.WCSPH(scene)
    state = solver.bind(tt.build_state(scene))
    spec, scfg = solver.spec, solver.sweep_cfg
    state = solver.rollout(state, 50)
    jax.block_until_ready(state.x)
    st, ids, _ = jax.jit(lambda s: gridops.sort_state_by_cell(s, spec))(state)
    n = ids.shape[0]
    block = scfg.block_size
    block_cap = scfg.pad_capacity // block
    print(f"n={n} cells={spec.num_cells} block_cap={block_cap} "
          f"window={scfg.window_cap}")

    plan = jax.jit(lambda i: gridops.seg_plan(i, spec, block, block_cap))
    print(f"seg_plan              : {timeit(plan, (ids,)):7.2f} ms")
    p = plan(ids)
    meta = jax.jit(
        lambda p, i: ps.seg_block_meta(p, i, spec, block, scfg.window_cap)
    )
    print(f"seg_block_meta        : {timeit(meta, (p, ids)):7.2f} ms")

    # primitives
    nq = block_cap * spec.num_rows * 2
    q = jnp.linspace(0, spec.num_cells, nq).astype(ids.dtype)
    for method in ("scan", "scan_unrolled", "sort", "compare_all"):
        try:
            f = jax.jit(lambda i, q, m=method: jnp.searchsorted(i, q, method=m))
            print(f"searchsorted[{method:13}] {nq} queries: "
                  f"{timeit(f, (ids, q)):7.2f} ms")
        except Exception as e:
            print(f"searchsorted[{method}]: {type(e).__name__}")

    hist = jax.jit(
        lambda i: jnp.cumsum(
            jnp.zeros(spec.num_cells + 1, jnp.int32).at[
                jnp.minimum(i, spec.num_cells)
            ].add(1, mode="drop")
        )
    )
    print(f"histogram+cumsum CSR ({spec.num_cells} cells): "
          f"{timeit(hist, (ids,)):7.2f} ms")

    # same scatter with the sortedness declared (both call sites pass
    # cell-sorted ids) — lets XLA pick a sorted-scatter lowering
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,),
    )
    hist_s = jax.jit(
        lambda i: jnp.cumsum(
            jax.lax.scatter_add(
                jnp.zeros(spec.num_cells + 1, jnp.int32),
                jnp.minimum(i, spec.num_cells)[:, None],
                jnp.ones_like(i, jnp.int32),
                dnums,
                indices_are_sorted=True,
                mode=jax.lax.GatherScatterMode.CLIP,
            )
        )
    )
    print(f"hist sorted-scatter   : {timeit(hist_s, (ids,)):7.2f} ms")
    # run-start scatter-min + reverse min-scan alternative
    hist_m = jax.jit(
        lambda i: jax.lax.associative_scan(
            jnp.minimum,
            jnp.full((spec.num_cells + 1,), n, jnp.int32).at[
                jnp.minimum(i, spec.num_cells)
            ].min(jnp.arange(n, dtype=jnp.int32), mode="drop",
                  indices_are_sorted=True),
            reverse=True,
        )
    )
    print(f"hist min-scatter+scan : {timeit(hist_m, (ids,)):7.2f} ms")
    bounds = hist(ids)
    gather = jax.jit(lambda b, q: b[jnp.minimum(q, spec.num_cells)])
    print(f"bounds gather {nq} queries: {timeit(gather, (bounds, q)):7.2f} ms")

    # back-map style gathers
    g1 = jax.jit(lambda a, idx: a[idx])
    idx = p.back_idx
    big = jnp.zeros((block_cap * block,), jnp.float32)
    print(f"back gather (n from {block_cap * block}): "
          f"{timeit(g1, (big, idx)):7.2f} ms")

    srt = jax.jit(lambda s: gridops.sort_state_by_cell(s, spec))
    print(f"sort_state_by_cell    : {timeit(srt, (state,)):7.2f} ms")
    key = jax.jit(
        lambda s: jax.lax.sort_key_val(
            gridops.flat_cell_ids(gridops.cell_coords(s.x, spec), s.material, spec),
            jnp.arange(s.capacity, dtype=jnp.int32),
            is_stable=True,
        )
    )
    print(f"  sort_key_val only   : {timeit(key, (state,)):7.2f} ms")


def probe_sweep():
    """Fixed-cost probe of the seg sweep: window DMA + tile loop + one
    touch per lane, no pair math — separates the sweeps' base cost from
    compute (run via: python tools/microbench_meta.py probe)."""
    import functools

    scene = tt.load_scene("scenes/demo_3d.json")
    solver = tt.WCSPH(scene)
    state = solver.bind(tt.build_state(scene))
    spec, scfg = solver.spec, solver.sweep_cfg
    state = solver.rollout(state, 50)
    jax.block_until_ready(state.x)
    st, ids, _ = jax.jit(lambda s: gridops.sort_state_by_cell(s, spec))(state)
    plan = jax.jit(lambda i: gridops.seg_plan(
        i, spec, scfg.block_size, scfg.pad_capacity // scfg.block_size))(ids)
    meta, _ = jax.jit(lambda p, i: ps.seg_block_meta(
        p, i, spec, scfg.block_size, scfg.window_cap))(plan, ids)
    params = solver.params
    pack = jax.jit(lambda s, i: ps.pack_state(
        s.x, s.v, s.density, s.pressure, s.mass, s.volume, s.material, i,
        params))(st, ids)

    for mode in ("probe_nocompact", "probe_flat", "probe_noroll",
                 "probe_noloop", "probe16", "probe", "density", "force"):
        fn = jax.jit(functools.partial(
            ps._run_sweep_seg, mode=mode, spec=spec, params=params,
            block=scfg.block_size, window=scfg.window_cap, tile=scfg.tile,
            interpret=False, fast_math=True))
        t = timeit(lambda p, m: fn(p, m), (pack, meta))
        print(f"seg sweep [{mode:8}] tile={scfg.tile:4}: {t:7.2f} ms")

    # linear-kernel fixed-cost comparison at identical window/tile/blocks:
    # manual double-buffered DMA + 4 BlockSpec inputs vs the seg kernel's
    # 11 pipelined inputs (probe results are cost-only, not physics)
    coords = gridops.cell_coords(st.x, spec)
    lmeta, _ = ps.block_meta(ids, coords, spec, scfg.block_size,
                             scfg.window_cap)
    for mode in ("probe", "density", "force"):
        fn = jax.jit(functools.partial(
            ps._run_sweep, mode=mode, spec=spec, params=params,
            block=scfg.block_size, window=scfg.window_cap, tile=scfg.tile,
            interpret=False))
        t = timeit(lambda p, m: fn(p, m), (pack, lmeta))
        print(f"lin sweep [{mode:8}] tile={scfg.tile:4}: {t:7.2f} ms")


if __name__ == "__main__":
    import sys as _sys

    if "probe" in _sys.argv:
        probe_sweep()
    elif "resort" in _sys.argv:
        pass  # dispatched by the bottom block (probe_resort defined below)
    else:
        main()


def probe_resort():
    """VERDICT r4 #4 probe set: what would a pallas/structured counting-sort
    permutation actually buy at 195k mid-collapse?  Measures the rebuild's
    two costs (key sort, bit-packed row gather) and the structural
    quantities any cheaper scheme must exploit (rank-shift bound W, cell
    churn).  Run: python tools/microbench_meta.py resort"""
    scene = tt.load_scene("scenes/demo_3d.json")
    solver = tt.WCSPH(scene)
    state = solver.bind(tt.build_state(scene))
    spec = solver.spec
    state = solver.rollout(state, 50)  # mid-collapse
    jax.block_until_ready(state.x)
    # rebuild-time input = the PREVIOUS rebuild's sorted order advanced by
    # R substeps: sort now, advance 2, measure the resort of that state
    st, ids0, _ = jax.jit(lambda s: gridops.sort_state_by_cell(s, spec))(state)
    st = solver.rollout(st, 2)
    jax.block_until_ready(st.x)
    n = st.capacity

    key = jax.jit(
        lambda s: jax.lax.sort_key_val(
            gridops.flat_cell_ids(gridops.cell_coords(s.x, spec), s.material, spec),
            jnp.arange(s.capacity, dtype=jnp.int32),
            is_stable=True,
        )
    )
    print(f"sort_key_val (n={n})  : {timeit(key, (st,)):7.2f} ms")
    ids_s, perm = key(st)

    # structural bounds for near-sorted schemes
    w = int(jax.device_get(jnp.max(jnp.abs(
        perm - jnp.arange(n, dtype=jnp.int32)))))
    ids_new = jax.jit(lambda s: gridops.flat_cell_ids(
        gridops.cell_coords(s.x, spec), s.material, spec))(st)
    churn = float(jax.device_get(jnp.mean(
        (ids_new != ids0).astype(jnp.float32))))
    print(f"rank-shift bound W    : {w} rows ({100.0 * w / n:.1f}% of n)")
    print(f"cell churn (2 substeps): {100.0 * churn:.2f}% of rows")

    # windowed batched sort (single-chip exchange-resort analog): chunks of
    # C rows sort [edge | chunk | edge] independently, keep the middle —
    # exact iff W <= E (seam-guardable like parallel/domain.py)
    for C, E in ((8192, 1024), (4096, 1024), (16384, 2048)):
        if n % C:
            continue
        B = n // C

        def winsort(i, pm, C=C, E=E, B=B):
            ext = jnp.stack([
                jax.lax.dynamic_slice_in_dim(
                    jnp.pad(i, (E, E), constant_values=np.iinfo(np.int32).max),
                    b * C, C + 2 * E) for b in range(B)
            ])
            exp = jnp.stack([
                jax.lax.dynamic_slice_in_dim(
                    jnp.pad(pm, (E, E)), b * C, C + 2 * E) for b in range(B)
            ])
            ks, vs = jax.lax.sort_key_val(ext, exp, dimension=1,
                                          is_stable=True)
            return ks[:, E:E + C].reshape(-1), vs[:, E:E + C].reshape(-1)

        f = jax.jit(winsort)
        iota = jnp.arange(n, dtype=jnp.int32)
        t = timeit(f, (ids_new, iota))
        ok = bool(jax.device_get(jnp.all(f(ids_new, iota)[0] == ids_s)))
        print(f"windowed sort C={C:6d} E={E:5d}: {t:7.2f} ms  exact={ok}")

    # the bit-packed row gather (the 2 ms cost) vs alternatives
    packed = jnp.zeros((n, 15), jnp.float32)
    g_row = jax.jit(lambda a, p: jnp.take(a, p, axis=0))
    print(f"row gather (n,15)     : {timeit(g_row, (packed, perm)):7.2f} ms")
    packT = jnp.zeros((15, n), jnp.float32)
    g_col = jax.jit(lambda a, p: jnp.take(a, p, axis=1))
    print(f"lane gather (15,n)    : {timeit(g_col, (packT, perm)):7.2f} ms")
    # gather fused into the pack transpose (would replace gather+pack)
    g_fuse = jax.jit(lambda a, p: jnp.take(a, p, axis=0).T)
    print(f"row gather + transpose: {timeit(g_fuse, (packed, perm)):7.2f} ms")


if __name__ == "__main__":
    import sys as _sys2

    if "resort" in _sys2.argv:
        probe_resort()
        raise SystemExit(0)
