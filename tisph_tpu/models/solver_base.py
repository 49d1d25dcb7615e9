"""Solver base: step orchestration shared by the WCSPH variants.

Reference counterpart: SPHBase / SPHBaseV2 ``step()`` orchestration
(sph_base.py:168-172, sph_basev2.py:210-214):

    resort -> boundary volumes -> substep(density, forces, advect) -> clamp

Here the whole step is ONE jitted pure function ``state' = step(state)``;
``rollout`` wraps N steps in a ``lax.fori_loop`` so the host dispatches a
frame (or a whole benchmark) at a time instead of one Taichi kernel launch
per phase (the reference does ~8 launches + a device sync per substep,
SURVEY.md §3.1).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from tisph_tpu.config import SceneConfig, SolverParams
from tisph_tpu.models.state import SimState
from tisph_tpu.ops import grid as gridops


class SolverBase:
    """Holds static configuration (SolverParams + GridSpec) and the jitted
    step.  All simulation state lives in the SimState pytree."""

    def __init__(
        self,
        scene: SceneConfig,
        compat: str = "reference",
        run_cap: int | None = None,
        params: SolverParams | None = None,
    ):
        self.scene = scene
        self.params = params if params is not None else SolverParams.from_scene(scene, compat)
        self._run_cap = run_cap
        self.spec: gridops.GridSpec | None = None
        if run_cap is not None:
            self.spec = self._make_spec(run_cap)
        self._step_jit: Callable[[SimState], SimState] | None = None
        self._rollout_jit = None

    def _make_spec(self, run_cap: int) -> gridops.GridSpec:
        return gridops.make_grid_spec(
            dim=self.scene.dim,
            domain_start=self.scene.domain_start,
            domain_end=self.scene.domain_end,
            support_length=self.scene.support_length,
            run_cap=run_cap,
        )

    def bind(self, state: SimState) -> "SolverBase":
        """Resolve the run capacity from the actual initial state (overflow
        accounting replaces the reference's fixed caps of 100/1000 neighbors,
        partice_system.py:25-26 / partice_systemv3.py:26-27)."""
        if self.spec is None:
            probe = self._make_spec(run_cap=8)
            cap = gridops.suggest_run_cap(state, probe)
            self.spec = self._make_spec(cap)
        return self

    # -- to be provided by concrete solvers ------------------------------
    def _step_fn(self, state: SimState) -> SimState:
        raise NotImplementedError

    # -- public API ------------------------------------------------------
    def step(self, state: SimState) -> SimState:
        """One solver step (resort + physics + boundary), jit-compiled."""
        if self.spec is None:
            self.bind(state)
        if self._step_jit is None:
            self._step_jit = jax.jit(self._step_fn)
        return self._step_jit(state)

    def rollout(self, state: SimState, num_steps: int) -> SimState:
        """Run ``num_steps`` steps inside one jitted fori_loop."""
        if self.spec is None:
            self.bind(state)
        if self._rollout_jit is None:
            def _roll(s: SimState, n: int) -> SimState:
                return jax.lax.fori_loop(0, n, lambda _, st: self._step_fn(st), s)
            self._rollout_jit = jax.jit(_roll, static_argnums=1)
        return self._rollout_jit(state, num_steps)

    def metrics(self, state: SimState) -> dict[str, jax.Array]:
        """Structured step metrics (SURVEY.md §5.5: the reference has only
        prints; we expose max velocity, density error, CFL, run overflow)."""
        if self.spec is None:
            self.bind(state)
        spec, params = self.spec, self.params

        @jax.jit
        def _metrics(st: SimState):
            fluid = st.fluid_mask
            speed = jnp.sqrt(jnp.sum(st.v * st.v, axis=-1))
            vmax = jnp.max(jnp.where(fluid, speed, 0.0))
            rho_err = jnp.where(
                fluid, jnp.abs(st.density - params.density0) / params.density0, 0.0
            )
            nf = jnp.maximum(jnp.sum(fluid), 1)
            sorted_state, sorted_ids, _ = gridops.sort_state_by_cell(st, spec)
            bounds = gridops.csr_bounds(sorted_ids, spec)
            coords = gridops.cell_coords(sorted_state.x, spec)
            runs = gridops.stencil_runs(coords, bounds, spec)
            return {
                "max_velocity": vmax,
                "cfl": vmax * params.dt / params.support_length,
                "avg_density_error": jnp.sum(rho_err) / nf,
                "max_density_error": jnp.max(rho_err),
                "max_run_length": gridops.max_run_length(runs),
                "run_cap": jnp.asarray(spec.run_cap),
                "num_active": st.num_active,
                "nan_count": jnp.sum(~jnp.isfinite(st.x)) + jnp.sum(~jnp.isfinite(st.v)),
            }

        return _metrics(state)
