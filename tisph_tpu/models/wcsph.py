"""WCSPH — the flagship solver (reference V2 stack: SPHBaseV2 + WCSPHV2).

One step (sph_basev2.py:210-214 / wcsphv2.py:102-106):

    1. spatial resort (ps.update, partice_systemv4.py:251-258)
    2. Akinci boundary-particle volumes (sph_basev2.py:195-201)
    3. density summation (wcsphv2.py:28-34, intended form)
    4. Tait EOS (wcsphv2.py:44-48)
    5. fused non-pressure + pressure sweep (wcsphv2.py:43-93)
    6. symplectic Euler advect (wcsphv2.py:95-100)
    7. domain-box collision clamp (sph_basev2.py:158-189)

Everything is a single pure jitted function over the SimState pytree.
"""

from __future__ import annotations

import dataclasses

from tisph_tpu.models.solver_base import SolverBase
from tisph_tpu.models.state import SimState
from tisph_tpu.ops import forces as F
from tisph_tpu.ops import grid as gridops


class WCSPH(SolverBase):
    def _step_fn(self, state: SimState) -> SimState:
        spec, params, scfg = self.spec, self.params, self.sweep_cfg

        # 1. resort by cell + neighbor structure
        state, sorted_ids, _ = gridops.sort_state_by_cell(state, spec)
        nd = gridops.build_neighbor_data(state, sorted_ids, spec, scfg)

        # 2. boundary volumes (static by default — boundary particles never
        # move; 'per_step' reproduces the reference's per-step recompute,
        # sph_basev2.py:212)
        if self.boundary_mode == "per_step":
            volume = F.compute_boundary_volumes(state, nd, spec, params, scfg)
            state = dataclasses.replace(state, volume=volume)

        # 3-4. density + EOS
        density = F.compute_densities(state, nd, spec, params, scfg)
        rho, pressure = F.compute_pressures(density, params)
        state = dataclasses.replace(state, density=rho, pressure=pressure)

        # 5-6. forces + advect
        d_velocity = F.compute_forces(state, nd, spec, params, scfg)
        state = F.advect(state, d_velocity, params)

        # 7. boundary clamp
        return F.enforce_domain_boundary(state, params)
