"""Cross-platform Mosaic lowering gate: AOT-lower every pallas kernel path
for TPU *from the CPU suite*.

Interpret-mode tests execute the kernel BODIES but never run Mosaic's
TPU lowering, so a kernel construct Mosaic cannot lower (e.g. a
value-level ``.at[].set`` — jnp emits a ``scatter`` primitive — inside a
``fori_loop``) passes the whole CPU suite and only explodes at first
real-TPU compile (caught once in round 3: sweeps.py's compaction loop).
``jax.jit(...).trace(...).lower(lowering_platforms=("tpu",))`` runs the
full Mosaic pipeline without needing a TPU device, so this class of
regression is testable on CPU.
"""

import dataclasses

import jax
import pytest

import tisph_tpu as tt
from tisph_tpu.models.state import pad_state_capacity
from tisph_tpu.ops.neighbors import SweepConfig

from test_pallas import _scene


def _lower_tpu(fn, *args):
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def _pallas_solver(scene, layout, cls=tt.WCSPH, cap=2048, sub=1, block=128,
                   **kw):
    solver = cls(
        scene,
        sweep_cfg=SweepConfig(
            impl="pallas", block_size=block, window_cap=512, tile=128,
            interpret=False, layout=layout, pad_capacity=8192,
            sub_slabs=sub,
        ),
        **kw,
    )
    state = solver.bind(pad_state_capacity(tt.build_state(scene), cap))
    return solver, state


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("layout", ["seg", "linear"])
def test_step_lowers_for_tpu(dim, layout):
    scene = _scene(dim=dim)
    solver, state = _pallas_solver(scene, layout)
    _lower_tpu(solver._step_fn, state)


@pytest.mark.parametrize("sub,block", [(2, 128), (4, 128), (2, 256)])
def test_sub_slab_step_lowers_for_tpu(sub, block):
    # per-sub-slab compacted streams (SweepConfig.sub_slabs) change the
    # compaction indexing and the math-loop slicing — lower each shape
    scene = _scene(dim=3)
    solver, state = _pallas_solver(scene, "seg", sub=sub, block=block)
    _lower_tpu(solver._step_fn, state)


def test_per_step_boundary_lowers_for_tpu():
    # bvol sweep (boundary_mode='per_step') rides the same kernel factory
    # but in a distinct mode — lower it too
    scene = _scene(dim=3)
    solver, state = _pallas_solver(scene, "seg", boundary_mode="per_step")
    _lower_tpu(solver._step_fn, state)


def test_rigid_coupled_step_lowers_for_tpu(tmp_path):
    # reaction sweep (rigid coupling) — the fourth kernel mode
    import json

    from tisph_tpu.geometry.mesh import box_mesh, save_obj
    from tisph_tpu.models.wcsph_rigid import WCSPHRigid

    mesh_path = tmp_path / "box.obj"
    save_obj(box_mesh((0.4, 0.6, 0.4), (0.6, 0.8, 0.6)), mesh_path)
    raw = {
        "configuration": {
            "dim": 3, "domainStart": [0.0] * 3, "domainEnd": [1.0] * 3,
            "particleRadius": 0.04, "density0": 1000,
            "gravitation": [0.0, -9.81, 0.0], "c_s": 40.0,
        },
        "rigidBodies": [
            {"geometryFile": str(mesh_path), "scale": [1, 1, 1],
             "translation": [0, 0, 0], "rotationAngle": 0,
             "rotationAxis": [0, 1, 0], "velocity": [0, 0, 0],
             "density": 500.0, "color": [150, 150, 150],
             "isDynamic": True}
        ],
        "fluidBlocks": [
            {"start": [0.15] * 3, "end": [0.5] * 3,
             "velocity": [0.0, 0.0, 0.0], "density": 1000.0,
             "color": [50, 100, 200]}
        ],
    }
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(raw))
    scene = tt.load_scene(p)
    solver, state = _pallas_solver(scene, "seg", cls=WCSPHRigid)
    rigid = solver.init_rigid(state)
    _lower_tpu(solver._coupled_step_fn, (state, rigid))


def test_static_boundary_skip_step_lowers_for_tpu(tmp_path):
    # a scene with STATIC boundary particles makes bind set _has_boundary,
    # so the density and plain-force sweeps compile their skippable
    # variants (per-block active flags) — lower that kernel shape too
    import json

    from tisph_tpu.geometry.mesh import box_mesh, save_obj

    mesh_path = tmp_path / "box.obj"
    save_obj(box_mesh((0.4, 0.6, 0.4), (0.6, 0.8, 0.6)), mesh_path)
    raw = {
        "configuration": {
            "dim": 3, "domainStart": [0.0] * 3, "domainEnd": [1.0] * 3,
            "particleRadius": 0.04, "density0": 1000,
            "gravitation": [0.0, -9.81, 0.0], "c_s": 40.0,
        },
        "rigidBodies": [
            {"geometryFile": str(mesh_path), "scale": [1, 1, 1],
             "translation": [0, 0, 0], "rotationAngle": 0,
             "rotationAxis": [0, 1, 0], "velocity": [0, 0, 0],
             "density": 500.0, "color": [150, 150, 150]}
        ],
        "fluidBlocks": [
            {"start": [0.15] * 3, "end": [0.5] * 3,
             "velocity": [0.0, 0.0, 0.0], "density": 1000.0,
             "color": [50, 100, 200]}
        ],
    }
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(raw))
    scene = tt.load_scene(p)
    solver, state = _pallas_solver(scene, "seg")
    assert solver._has_boundary
    _lower_tpu(solver._step_fn, state)


def test_amortized_group_lowers_for_tpu():
    # the R-group rollout body (build once, apply R times) is its own
    # traced program — lower the R=2 group
    scene = _scene(dim=3)
    solver, state = _pallas_solver(scene, "seg")
    solver.sweep_cfg = dataclasses.replace(solver.sweep_cfg, resort_every=2)

    def group(s):
        s, cache = solver._seg_build(s)
        s = solver._seg_apply(s, cache)
        return solver._seg_apply(s, cache)

    _lower_tpu(group, state)
