"""3-axis (x × y × z) box decomposition (parallel/domain2d.py::
ShardedWCSPHRect) on the 8-device CPU mesh: per-axis buffered migration +
3-stage corner-covering halo exchange (last axis first — double-corner
cells ride z THEN y THEN x) must reproduce the single-chip trajectory.
The 2x2x2 mesh cuts ALL THREE grid axes, so every corner/edge/face class
of the box halo is live in these gates."""

import numpy as np
import jax
import pytest

import tisph_tpu as tt
from tisph_tpu.ops.neighbors import SweepConfig
from tisph_tpu.parallel import ShardedWCSPHRect, make_mesh3d

from tests.test_parallel2d import _scene, _canon, _single_chip, _CFG


def test_3d_box_matches_single_chip():
    scene = _scene()
    steps = 5
    x1, r1, v1 = _canon(_single_chip(scene, steps))

    mesh = make_mesh3d(2, 2, 2)
    s3 = ShardedWCSPHRect(scene, mesh, sweep_cfg=SweepConfig(**_CFG))
    st3 = s3.bind(tt.build_state(scene))
    for _ in range(steps):
        st3 = s3.step(st3)
    o3 = jax.device_get(st3)
    x3, r3, v3 = _canon(o3)

    assert len(x1) == len(x3)
    assert np.abs(x1 - x3).max() < 1e-5, (
        f"3-axis box position divergence {np.abs(x1 - x3).max():.2e}"
    )
    np.testing.assert_allclose(v1, v3, atol=5e-3)
    np.testing.assert_allclose(r1, r3, rtol=1e-4)
    m = jax.device_get(s3.metrics(st3))
    assert int(m["nan_count"]) == 0
    assert int(m["occ_halo"]) == 0, "halo buffer overflowed silently"
    assert int(m["migrate_anomalies"]) == 0


def test_3d_box_amortized_rollout_matches_single_chip():
    """resort_every=2 over the 2x2x2 mesh: cached merge permutation +
    6-ppermute value refresh per substep must reproduce the single-chip
    amortized trajectory."""
    scene = _scene()
    cfg = dict(_CFG, resort_every=2)
    s1 = tt.WCSPH(scene, sweep_cfg=SweepConfig(**cfg))
    st1 = s1.bind(tt.build_state(scene))
    st1 = s1.rollout(st1, 6)
    x1, r1, _ = _canon(jax.device_get(st1))

    mesh = make_mesh3d(2, 2, 2)
    s3 = ShardedWCSPHRect(scene, mesh, sweep_cfg=SweepConfig(**cfg))
    st3 = s3.bind(tt.build_state(scene))
    st3 = s3.rollout(st3, 6)
    x3, r3, _ = _canon(jax.device_get(st3))

    assert np.abs(x1 - x3).max() < 1e-5
    np.testing.assert_allclose(r1, r3, rtol=1e-4)


def test_3d_box_rejects_bad_meshes():
    scene2d = tt.scene_from_dict(
        {
            "configuration": {
                "dim": 2,
                "domainStart": [0.0, 0.0],
                "domainEnd": [1.0, 1.0],
                "particleRadius": 0.01,
                "density0": 1000,
                "gravitation": [0.0, -9.81],
                "c_s": 50.0,
            },
            "fluidBlocks": [
                {"start": [0.1, 0.1], "end": [0.4, 0.4],
                 "velocity": [0.0, 0.0], "density": 1000.0,
                 "color": [50, 100, 200]}
            ],
            "rigidBodies": [],
        }
    )
    with pytest.raises(ValueError, match="dim"):
        ShardedWCSPHRect(scene2d, make_mesh3d(2, 2, 2))
