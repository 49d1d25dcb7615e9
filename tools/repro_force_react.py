"""Diagnose the fused force_react vs separate force/reaction sweeps on the
REAL TPU (tests/test_seg.py::test_seg_force_react_matches_separate_sweeps
failed compiled while passing in interpret mode).  Prints mismatch
counts/magnitudes split by row family so the failure class is obvious:
~1-ulp scattered -> Mosaic scheduling/FMA divergence; large/structured ->
a real kernel bug.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

import jax.numpy as jnp

import tisph_tpu as tt
from tisph_tpu.geometry.mesh import box_mesh, save_obj
from tisph_tpu.ops import forces as F
from tisph_tpu.ops import grid as gridops
from tisph_tpu.ops.pallas import sweeps as ps


def main() -> int:
    tmp = tempfile.mkdtemp()
    mesh_path = os.path.join(tmp, "box.obj")
    save_obj(box_mesh((0.35, 0.5, 0.35), (0.6, 0.75, 0.6)), mesh_path)
    raw = {
        "configuration": {
            "dim": 3, "domainStart": [0.0] * 3, "domainEnd": [1.0] * 3,
            "particleRadius": 0.04, "density0": 1000,
            "gravitation": [0.0, -9.81, 0.0], "c_s": 40.0,
        },
        "rigidBodies": [
            {"geometryFile": mesh_path, "scale": [1, 1, 1],
             "translation": [0, 0, 0], "rotationAngle": 0,
             "rotationAxis": [0, 1, 0], "velocity": [0, 0, 0],
             "density": 500.0, "color": [150, 150, 150],
             "isDynamic": True}
        ],
        "fluidBlocks": [
            {"start": [0.15] * 3, "end": [0.6, 0.55, 0.6],
             "velocity": [0.1, -0.4, 0.2], "density": 1000.0,
             "color": [50, 100, 200]}
        ],
    }
    sp = os.path.join(tmp, "scene.json")
    with open(sp, "w") as f:
        json.dump(raw, f)
    scene = tt.load_scene(sp)

    # same setup as tests/test_seg.py::_seg_setup
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import dataclasses

    state = tt.build_state(scene)
    solver = tt.WCSPH(scene)
    state = solver.bind(state)
    scfg = solver.sweep_cfg
    spec, params = solver.spec, solver.params
    block_cap = scfg.pad_capacity // scfg.block_size
    state_s, ids, _ = gridops.sort_state_by_cell(state, spec)
    plan = gridops.seg_plan(ids, spec, scfg.block_size, block_cap)
    meta, _ = ps.seg_block_meta(plan, ids, spec, scfg.block_size,
                                scfg.window_cap, sub=scfg.sub_slabs)
    pack = ps.pack_state(
        state_s.x, state_s.v, state_s.density, state_s.pressure,
        state_s.mass, state_s.volume, state_s.material, ids, params,
    )

    rho = ps.density_sweep_seg(
        pack, meta, spec, params, scfg.block_size, scfg.window_cap,
        tile=scfg.tile,
    )
    rho = jnp.where(plan.back_valid & state_s.fluid_mask, rho,
                    state_s.density)
    rho, p = F.compute_pressures(rho, params)
    pack = ps.repack_eos(pack, rho, p)

    kw = dict(tile=scfg.tile)
    dv = np.asarray(ps.force_sweep_seg(pack, meta, spec, params,
                                       scfg.block_size, scfg.window_cap, **kw))
    rx = np.asarray(ps.reaction_sweep_seg(pack, meta, spec, params,
                                          scfg.block_size, scfg.window_cap,
                                          **kw))
    fr = np.asarray(ps.force_react_sweep_seg(pack, meta, spec, params,
                                             scfg.block_size, scfg.window_cap,
                                             **kw))
    valid = np.asarray(plan.back_valid)
    fluid = (np.asarray(state_s.material) == 1) & valid
    bound = (np.asarray(state_s.material) == 0) & valid

    def report(name, a, b, mask):
        a, b = a[mask], b[mask]
        neq = (a != b) & ~(np.isnan(a) & np.isnan(b))
        n = int(neq.sum())
        print(f"{name}: rows={mask.sum()} mismatch_elems={n}", end="")
        if n:
            ai, bi = a[neq], b[neq]
            ulp = np.abs(ai.view(np.int32).astype(np.int64)
                         - bi.view(np.int32).astype(np.int64))
            rel = np.abs(ai - bi) / np.maximum(np.abs(bi), 1e-30)
            print(f"  max_ulp={ulp.max()} med_ulp={np.median(ulp):.0f} "
                  f"max_rel={rel.max():.3e}", end="")
            bad = np.argwhere(neq)[:5]
            print(f"  sample a={ai[:3]} b={bi[:3]}", end="")
        print()
        return n

    nf = report("fluid (fused vs force)", fr, dv, fluid)
    nb = report("bound (fused vs react)", fr, rx, bound)
    return 0 if nf == nb == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
