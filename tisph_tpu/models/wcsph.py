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
        if self.sweep_cfg.impl == "pallas":
            return self._step_fn_pallas(state)
        spec, params, scfg = self.spec, self.params, self.sweep_cfg

        # 1. resort by cell + neighbor structure
        state, sorted_ids, _ = gridops.sort_state_by_cell(state, spec)
        nd = gridops.build_neighbor_data(state, sorted_ids, spec, scfg)
        state = self._track_occ(state, nd.window_need)

        # 2. boundary volumes (static by default — boundary particles never
        # move; 'per_step' reproduces the reference's per-step recompute,
        # sph_basev2.py:212)
        if self.boundary_mode == "per_step":
            volume = F.compute_boundary_volumes(state, nd, spec, params, scfg)
            state = dataclasses.replace(state, volume=volume)

        # 3-4. density + EOS (reference-exact: overwrite with the self term,
        # wcsphv2.py:29-34 — see F.apply_density_mode)
        density = F.compute_densities(state, nd, spec, params, scfg)
        density = F.apply_density_mode(density, state, params)
        rho, pressure = F.compute_pressures(density, params)
        state = dataclasses.replace(state, density=rho, pressure=pressure)

        # 5-6. forces + advect
        d_velocity = F.compute_forces(state, nd, spec, params, scfg)
        state = F.advect(state, d_velocity, params)

        # 7. boundary clamp
        return F.enforce_domain_boundary(state, params)

    def _step_fn_pallas(self, state: SimState) -> SimState:
        """Same step, with the two neighbor sweeps running as fused Pallas
        TPU kernels (ops/pallas/sweeps.py) over the packed sorted state."""
        if self.sweep_cfg.layout == "seg":
            return self._step_fn_pallas_seg(state)
        import jax.numpy as jnp

        from tisph_tpu.ops.pallas import sweeps as ps

        spec, params, scfg = self.spec, self.params, self.sweep_cfg

        state, sorted_ids, _ = gridops.sort_state_by_cell(state, spec)
        coords = gridops.cell_coords(state.x, spec)
        meta, need = ps.block_meta(
            sorted_ids, coords, spec, scfg.block_size, scfg.window_cap
        )
        state = self._track_occ(state, need)
        pack = ps.pack_state(
            state.x, state.v, state.density, state.pressure,
            state.mass, state.volume, state.material, sorted_ids, params,
        )

        if self.boundary_mode == "per_step":
            nd = gridops.build_neighbor_data(
                state, sorted_ids, spec,
                dataclasses.replace(scfg, impl="blocked"),
            )
            volume = F.compute_boundary_volumes(
                state, nd, spec, params, dataclasses.replace(scfg, impl="blocked")
            )
            state = dataclasses.replace(state, volume=volume)
            fl = (state.material == 1).astype(jnp.float32)
            bd = (state.material == 0).astype(jnp.float32)
            pack = pack.at[ps._VOL, :].set(volume)
            pack = pack.at[ps._EFFM, :].set(
                fl * state.mass + bd * (params.density0 * volume)
            )

        rho = ps.density_sweep(
            pack, meta, spec, params, scfg.block_size, scfg.window_cap,
            tile=scfg.tile, interpret=scfg.interpret, fast_math=scfg.fast_math,
        )
        rho = jnp.where(state.fluid_mask, rho, state.density)
        rho = F.apply_density_mode(rho, state, params)
        rho, pressure = F.compute_pressures(rho, params)
        state = dataclasses.replace(state, density=rho, pressure=pressure)
        pack = ps.repack_eos(pack, rho, pressure)

        dv = ps.force_sweep(
            pack, meta, spec, params, scfg.block_size, scfg.window_cap,
            tile=scfg.tile, interpret=scfg.interpret, fast_math=scfg.fast_math,
        )
        dv = jnp.where(state.fluid_mask[:, None], dv, 0.0)

        state = F.advect(state, dv, params)
        return F.enforce_domain_boundary(state, params)

    def _step_fn_pallas_seg(self, state: SimState) -> SimState:
        """Pallas step over anchor-confined logical blocks (grid.seg_plan):
        the particle array and the pack stay compact-sorted; dense grid
        rows get their own z-trimmed candidate windows while sparse-row
        runs share multi-row blocks (spray-safe), and sweep outputs are
        written COMPACTLY by the kernels through the per-block own-lane
        mask (valid where plan.back_valid)."""
        state, cache = self._seg_build(state)
        return self._seg_apply(state, cache)

    def _seg_build(self, state: SimState):
        """Resort + rebuild the seg neighbor structure (sort, plan, block
        meta).  Returns (sorted_state, cache); the cache is a pytree that
        stays valid for a few substeps of motion (see SweepConfig
        .resort_every)."""
        import jax.numpy as jnp

        from tisph_tpu.ops.pallas import sweeps as ps

        spec, scfg = self.spec, self.sweep_cfg
        block_cap = scfg.pad_capacity // scfg.block_size

        state, sorted_ids, _ = gridops.sort_state_by_cell(state, spec)
        # one CSR bounds build feeds both the plan and the window meta;
        # the pallas compare-reduce replaces the serialized XLA scatter
        bounds = gridops.csr_bounds_fast(
            sorted_ids, spec, interpret=scfg.interpret
        )
        plan = gridops.seg_plan(
            sorted_ids, spec, scfg.block_size, block_cap, bounds=bounds
        )
        state = dataclasses.replace(
            state,
            occ_rowpad=jnp.maximum(
                jnp.asarray(state.occ_rowpad, jnp.int32),
                (plan.need_blocks * scfg.block_size).astype(jnp.int32),
            ),
        )
        meta, need = ps.seg_block_meta(
            plan, sorted_ids, spec, scfg.block_size, scfg.window_cap,
            bounds=bounds, sub=scfg.sub_slabs,
        )
        state = self._track_occ(state, need)
        return state, (plan, meta, sorted_ids)

    def _seg_apply(self, state: SimState, cache) -> SimState:
        """One physics step against a (possibly stale) seg structure.

        Pair membership in the seg kernels is the SORT-TIME cell-id test
        (each j's sorted id must lie in the stencil-offset cell range of
        its i, ops/pallas/sweeps.py::_seg_sweep_kernel) AND ``r2 < h^2``
        against CURRENT positions.  Under resort_every amortization both
        sides of the id test use the cached sort-time ids, so the
        candidate set is exactly the set of pairs whose SORT-TIME cells
        were within one cell (= the support radius); current positions
        only tighten it.  A pair is therefore missed only when motion
        since the last rebuild brought its current distance under h while
        its sort-time cell separation exceeded one cell — which needs
        sort-time distance > h, so the missed kernel weight is
        O((2*delta_moved/h)^3) for CFL-bounded motion over a few substeps
        — the same order as the fast_math viscosity approximation
        (measured in tests/test_seg.py::test_amortized_resort_divergence).

        The physics itself lives in :meth:`_seg_apply_pack`, a pure
        pack -> pack function; amortized rollouts carry the PACK between
        substeps (SolverBase.rollout) and only sync SimState at R-group
        boundaries — the per-substep SimState <-> pack transposes were a
        measured residue (VERDICT r3 weak #2)."""
        from tisph_tpu.ops.pallas import sweeps as ps

        spec, params = self.spec, self.params
        plan, meta, sorted_ids = cache
        pack = ps.pack_state(
            state.x, state.v, state.density, state.pressure,
            state.mass, state.volume, state.material, sorted_ids, params,
        )
        pack = self._seg_apply_pack(pack, cache)
        return self._seg_unpack(state, pack)

    def _seg_apply_pack(self, pack, cache, with_reactions=False):
        """One physics substep entirely in pack space: bvol (per_step) ->
        density -> EOS -> force -> advect -> domain clamp, with the
        elementwise phases as ROW ops on the (16, n) pack (no SimState
        round trip).  Bitwise-identical physics to the round-3 SimState
        formulation (same ops in the same per-element order; gated by the
        goldens and test_seg_step_matches_blocked_trajectory).

        ``with_reactions`` (the rigid coupled path): the force sweep runs
        in the fused force_react mode and the call returns
        ``(pack, reactions)`` — the masked fluid->boundary reaction
        forces — instead of just the pack; the caller integrates the
        bodies and writes their x/v rows back."""
        import jax.numpy as jnp

        from tisph_tpu.ops.pallas import sweeps as ps

        spec, params, scfg = self.spec, self.params, self.sweep_cfg
        plan, meta, _ = cache
        dim = spec.dim
        kw = dict(tile=scfg.tile, interpret=scfg.interpret,
                  fast_math=scfg.fast_math, sub=scfg.sub_slabs)

        fl = pack[ps._FL] > 0.0
        # boundary-aware block skip (exact; see ps.active_blocks): when the
        # scene has boundary particles, each sweep runs only on blocks
        # whose i-slab holds a row of its consumer family.  Scenes without
        # boundary rows (every block is consumer-active) compile the plain
        # kernels (self._has_boundary is resolved once at bind).
        skip = getattr(self, "_has_boundary", False)
        act_fl = (ps.active_blocks(pack, meta, scfg.block_size, rows=(ps._FL,))
                  if skip else None)
        if self.boundary_mode == "per_step":
            # Akinci boundary volumes on current positions
            # (sph_basev2.py:195-201, 212): delta sweep -> V = 1/delta ->
            # refresh the volume-derived rows.  Only blocks whose i-slab
            # holds a boundary row run (exact: the refresh masks with
            # bd & back_valid, so all-fluid blocks' outputs are never
            # consumed) — rigid scenes are ~99% fluid rows
            delta_c = ps.bvol_sweep_seg(
                pack, meta, spec, params, scfg.block_size, scfg.window_cap,
                active=ps.bvol_active_blocks(pack, meta, scfg.block_size),
                **kw
            )
            bd = pack[ps._BD] > 0.0
            keep_b = plan.back_valid & bd
            volume = jnp.where(
                keep_b, 1.0 / jnp.maximum(delta_c, 1e-10), pack[ps._VOL]
            )
            pack = (
                pack.at[ps._VOL, :].set(volume)
                .at[ps._EFFM, :].set(
                    pack[ps._FLM]
                    + jnp.where(bd, params.density0 * volume, 0.0)
                )
            )

        rho_c = ps.density_sweep_seg(
            pack, meta, spec, params, scfg.block_size, scfg.window_cap,
            active=act_fl, **kw
        )
        keep = plan.back_valid & fl
        rho = jnp.where(keep, rho_c, pack[ps._RHO])
        if params.reference_exact:
            # V2 density-overwrite bug replay (see F.apply_density_mode)
            from tisph_tpu.ops.kernels import cubic_kernel_sigma

            w0 = cubic_kernel_sigma(params.dim, params.support_length)
            rho = jnp.where(fl, pack[ps._M] * w0, rho)
        rho, pressure = F.compute_pressures(rho, params)
        pack = ps.repack_eos(pack, rho, pressure)

        sweep = ps.force_react_sweep_seg if with_reactions else ps.force_sweep_seg
        act_force = (
            ps.active_blocks(pack, meta, scfg.block_size,
                             rows=(ps._FL, ps._BD))
            if (skip and with_reactions) else act_fl
        )
        dv_c = sweep(
            pack, meta, spec, params, scfg.block_size, scfg.window_cap,
            active=act_force, **kw
        )

        # symplectic Euler advect (wcsphv2.py:95-100) + domain-box clamp
        # with combined collision normal (sph_basev2.py:158-189), as row
        # ops — same per-element op order as F.advect /
        # F.enforce_domain_boundary
        import numpy as np

        dt = params.dt
        # f32 bound arithmetic, matching F.enforce_domain_boundary's
        # jnp.asarray(domain, f32) +/- padding exactly
        lo = [np.float32(np.float32(s) + np.float32(params.padding))
              for s in params.domain_start]
        hi = [np.float32(np.float32(e) - np.float32(params.padding))
              for e in params.domain_end]
        xs, vs, normal = [], [], []
        for a in range(dim):
            dv_a = jnp.where(keep, dv_c[:, a], 0.0)
            v_a = jnp.where(fl, pack[ps._V + a] + dt * dv_a, pack[ps._V + a])
            x_a = jnp.where(fl, pack[ps._X + a] + dt * v_a, pack[ps._X + a])
            n_a = jnp.where(x_a > hi[a], 1.0, 0.0) + jnp.where(
                x_a <= lo[a], -1.0, 0.0
            )
            xs.append(jnp.where(fl, jnp.clip(x_a, lo[a], hi[a]), x_a))
            vs.append(v_a)
            normal.append(n_a)
        n2 = sum(n_a * n_a for n_a in normal)
        n_len = jnp.sqrt(n2)
        len_c = jnp.maximum(n_len, 1e-6)
        n_hat = [n_a / len_c for n_a in normal]
        v_dot_n = sum(v_a * nh for v_a, nh in zip(vs, n_hat))
        refl = fl & (n_len > 1e-6)
        cf = 1.0 + params.collision_factor
        for a in range(dim):
            v_a = jnp.where(refl, vs[a] - cf * v_dot_n * n_hat[a], vs[a])
            pack = pack.at[ps._V + a, :].set(v_a)
            pack = pack.at[ps._X + a, :].set(xs[a])
        if with_reactions:
            keep_b = plan.back_valid & (pack[ps._BD] > 0.0)
            return pack, jnp.where(keep_b[:, None], dv_c, 0.0)
        return pack

    def _seg_unpack(self, state: SimState, pack) -> SimState:
        """Sync the pack's mutable rows back into SimState (x, v, density,
        pressure; volume too under per_step boundaries)."""
        import jax.numpy as jnp

        from tisph_tpu.ops.pallas import sweeps as ps

        dim = self.spec.dim
        repl = dict(
            x=jnp.stack([pack[ps._X + a] for a in range(dim)], axis=1),
            v=jnp.stack([pack[ps._V + a] for a in range(dim)], axis=1),
            density=pack[ps._RHO],
            pressure=pack[ps._P],
        )
        if self.boundary_mode == "per_step":
            repl["volume"] = pack[ps._VOL]
        return dataclasses.replace(state, **repl)
