"""Golden-trajectory regression: a recorded 2D dam-break trajectory pins the
physics across refactors (beyond the live fp64 oracle gate, this catches
unintended behavior drift in ANY component of the step).

The golden file is (re)generated with:
    python tests/test_golden.py --regenerate
"""

import os
import sys

import numpy as np
import jax

import tisph_tpu as tt

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_2d_dam_break.npz")

SCENE = {
    "configuration": {
        "dim": 2,
        "domainStart": [0.0, 0.0],
        "domainEnd": [2.0, 1.0],
        "particleRadius": 0.02,
        "density0": 1000,
        "gravitation": [0.0, -9.81],
        "c_s": 50.0,
    },
    "boundaryBlocks": [
        {"start": [0.9, 0.08], "end": [1.1, 0.3]}
    ],
    "fluidBlocks": [
        {"start": [0.1, 0.1], "end": [0.5, 0.5], "velocity": [1.0, 0.0],
         "density": 1000.0, "color": [50, 100, 200]}
    ],
    "rigidBodies": [],
}
STEPS = 40


def _run():
    scene = tt.scene_from_dict(SCENE)
    state = tt.build_state(scene)
    solver = tt.WCSPH(scene)
    state = solver.bind(state)
    state = solver.rollout(state, STEPS)
    out = jax.device_get(state)
    act = np.asarray(out.material) != -1
    order = np.lexsort(np.asarray(out.x)[act].T[::-1])
    return {
        "x": np.asarray(out.x)[act][order],
        "v": np.asarray(out.v)[act][order],
        "density": np.asarray(out.density)[act][order],
        "material": np.asarray(out.material)[act][order],
    }


def test_golden_trajectory():
    assert os.path.exists(GOLDEN), "golden file missing — regenerate"
    got = _run()
    with np.load(GOLDEN) as z:
        np.testing.assert_array_equal(got["material"], z["material"])
        # fp32 noise across compilers/platforms; positions are the gate
        np.testing.assert_allclose(got["x"], z["x"], atol=5e-5)
        np.testing.assert_allclose(got["v"], z["v"], atol=5e-2)
        np.testing.assert_allclose(got["density"], z["density"], rtol=5e-4)


if __name__ == "__main__":
    if "--regenerate" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        np.savez_compressed(GOLDEN, **_run())
        print(f"golden written: {GOLDEN}")
