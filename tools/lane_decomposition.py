"""Measure the seg sweep's processed-lane decomposition, and project the
per-SUB-SLAB window variant.

The sweep is vector-throughput-bound (lanes are time; ROADMAP "levers
still open" #1): every i-lane of a 128-i block processes the block's full
compacted window union, though each i's true candidate range is only its
own ~3 z-cells per stencil row.  Splitting each block into m i-sub-slabs
with their own (smaller) compaction unions cuts the processed-lane count
at the cost of m compaction passes.  This tool computes, from the real
mid-collapse plan on CPU:

    per m in {1, 2, 4, 8}:
      math lanes  = sum_blocks sum_subs ceil_tile(union_s) * (block/m)/block
                    (reported per-i: sum ceil_tile(union_s) / m)
      compaction chunks = sum_blocks sum_subs sum_rows ceil(need_s_r / 128)

Usage: python tools/lane_decomposition.py [scene.json] [--settle N] [--cpu]
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="scenes/demo_3d.json")
    ap.add_argument("--settle", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tile", type=int, default=256)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    import tisph_tpu as tt
    from tisph_tpu.ops import grid as gridops

    scene = tt.load_scene(args.scene)
    state = tt.build_state(scene)
    solver = tt.WCSPH(scene)
    state = solver.bind(state)
    if args.settle:
        state = solver.rollout(state, args.settle)
    spec, scfg = solver.spec, solver.sweep_cfg
    block = scfg.block_size
    state, ids, _ = gridops.sort_state_by_cell(state, spec)
    bounds = gridops.csr_bounds_hist(ids, spec)
    plan = gridops.seg_plan(ids, spec, block, scfg.pad_capacity // block,
                            bounds=bounds)

    ids = np.asarray(jax.device_get(ids))
    bounds = np.asarray(jax.device_get(bounds))
    seg_start = np.asarray(jax.device_get(plan.seg_start))
    seg_len = np.asarray(jax.device_get(plan.seg_len))
    own_lo = np.asarray(jax.device_get(plan.own_lo))
    act = seg_len > 0
    strides = np.asarray(spec.strides)
    offsets = gridops._row_offsets(spec)
    o_offs = np.array(
        [int(np.dot(o, strides[: spec.dim - 1])) if spec.dim > 1 else 0
         for o in offsets]
    )
    n = ids.shape[0]
    G = spec.num_cells
    tile = args.tile

    def union_lanes(id_first, id_last):
        """True-union lanes and per-row chunk count for one sub-slab's
        window set (the same CSR-range construction seg_block_meta uses)."""
        lanes = 0
        chunks = 0
        for off in o_offs:
            lo = np.clip(id_first + off - 1, 0, G)
            hi = np.clip(id_last + off + 1, -1, G - 1)
            s = bounds[lo]
            e = bounds[np.clip(hi + 1, 0, G)]
            t = max(int(e) - int(s), 0)
            lanes += t
            chunks += -(-t // 128)
        return lanes, chunks

    for m in (1, 2, 4, 8):
        bs = block // m
        math_lanes = 0.0   # per-i processed lanes (sum over i of its
        #                    sub-slab's ceil_tile(union)) / n_active
        tot_chunks = 0
        n_act_lanes = 0
        for b in np.nonzero(act)[0]:
            lo_b = int(own_lo[b])
            hi_b = lo_b + int(seg_len[b])
            for s in range(m):
                a = max(lo_b, s * bs)
                z = min(hi_b, (s + 1) * bs)
                if a >= z:
                    continue
                gf = int(seg_start[b]) + a
                gl = int(seg_start[b]) + z - 1
                idf = int(ids[min(gf, n - 1)])
                idl = int(ids[min(gl, n - 1)])
                idf = min(idf, G - 1)
                idl = min(idl, G - 1)
                lanes, chunks = union_lanes(idf, idl)
                ceil_t = -(-lanes // tile) * tile
                math_lanes += ceil_t * (z - a)
                tot_chunks += chunks
                n_act_lanes += z - a
        print(f"m={m}: math lanes/i = {math_lanes / max(n_act_lanes, 1):8.1f}"
              f"   compaction chunks total = {tot_chunks}"
              f"   (blocks={int(act.sum())})")


if __name__ == "__main__":
    main()
