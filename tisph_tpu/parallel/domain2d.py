"""Rectangle (x × y, or x × y × z box) domain decomposition over a 2- or
3-axis device mesh.

The 1-D slab decomposition (parallel/domain.py) shards the globally
cell-sorted array into contiguous row chunks — spatial x-slabs.  Its shard
count is capped by the domain's x-resolution (slabs thinner than the
stencil reach degenerate into the all_gather halo path), which is the last
scoped-but-unbuilt step of the 1e9 bridge for fixed-size domains
(docs/design.md "The bridge to 1e9"; VERDICT r4 #1).  This module removes
that cap: shards own fixed cell rectangles (2-axis mesh) or boxes (3-axis
mesh), so the per-shard boundary area — and with it the halo bytes —
scales with the rectangle perimeter / box surface instead of a full
domain cross-section.

Design (all sweeps/kernels are the UNCHANGED seg pallas tier; written for
the 2-axis case, the 3-axis one adds a z stage to every exchange):

- **Ownership**: shard (sx, sy) owns the cells with ``tbl_sx[cx] == sx``
  and ``tbl_sy[cy] == sy`` — each axis cut into ``S_a`` intervals at
  equal-count quantiles of the bound-time distribution.  Every axis's
  cuts are GLOBAL (identical across the other axes) as a CORRECTNESS
  requirement: misaligned per-slab bands need halo rows from arbitrarily
  deep inside diagonal shards, which no 1-layer mesh-neighbor exchange
  can deliver (see _make_cuts); residual imbalance is absorbed by
  ``balance_slack`` + the occ_shard-steered rebalance.  Each shard
  stores its particles sorted
  by the GLOBAL row-major flat cell id in a fixed ``shard_rows`` slot
  budget with an inactive sentinel tail (the locality basis is the same
  flat id as everywhere else — reference
  /root/reference/core/partice_system/partice_system.py:22 — so the
  window machinery and the separable per-pair membership test carry over
  verbatim).

- **Migration** (the rect resort, once per R-group rebuild): particles
  whose cell crossed a cut move to the neighbor shard via one fixed-size
  buffered ppermute phase per axis, x then y (then z) — a diagonal
  migrant rides every phase it needs.  Motion between rebuilds is
  CFL-bounded ≪ one cell, so targets beyond the adjacent shard cannot
  occur in steady state; they are clamped, counted in ``occ_resort``, and
  ratchet one shard per rebuild toward their true owner.  After the
  phases each shard stable-sorts its [own ∥ received] rows by cell id and
  keeps the first ``shard_rows`` (sentinels sort to the tail).
  ``occ_shard`` tracks the pmax'd active row count so run() can rebalance
  the cuts BEFORE the cut would drop a particle.

- **Halo**: the stencil needs exactly the 1-cell layer around each
  rectangle.  One buffered exchange stage per axis covers it INCLUDING
  corners by running LAST AXIS FIRST: the y-stage (after z, on a 3-axis
  mesh) sends each shard's top/bottom cell layers along "sy"; the x-stage
  then sends the left/right cell layers of (own ∥ later-axis halos) along
  "sx", so corner (and 3-axis double-corner) cells ride through the
  earlier-received buffers.  The extended array [own ∥ halos] is
  merge-sorted by cell id once per rebuild (the j side of the sweeps must
  be id-sorted); the merge permutation and the buffer gather indices are
  cached, so each substep's VALUE refresh is 2 ppermutes per axis of
  (H, C) buffers + cached row gathers — the rect analog of the 1-D
  path's per-substep halo exchanges.

- **i/j split**: own rows interleave with halo rows in the id-merged
  extended array, so the sweeps take the local pack as a SEPARATE i side
  (``ipack`` — ops/pallas/sweeps.py; bitwise-equal to the 1-D offset
  addressing, tests/test_seg.py::test_seg_separate_ipack_matches_offset_
  addressing).  The seg plan is built over the local rows; windows search
  the extended ids.  The self-pair still cancels exactly: own rows'
  values in ipack and the extended pack are copies of the same f32s.

Dynamic rigid bodies compose with the 2-D mesh exactly like the 1-D one
(per-substep bvol + fused force_react sweeps; GSPMD-reduced body forces —
see ShardedWCSPH._coupled_apply).  Emitters compose too: every shard's
``shard_rows`` chunk keeps its own inactive sentinel tail after the local
id sort, so emission activates each shard's OWNED seeds into its local
tail (``_maybe_emit`` — all-or-nothing fire via a room ``pmin`` keeps the
cadence exact across the mesh, and placement in the owner shard means new
rows never migrate at the next rebuild).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tisph_tpu.config import SceneConfig, SolverParams
from tisph_tpu.models.state import SimState, MATERIAL_FLUID, MATERIAL_INVALID
from tisph_tpu.models.solver_base import SolverBase
from tisph_tpu.ops import forces as F
from tisph_tpu.ops import grid as gridops
from tisph_tpu.ops.eos import tait_pressure
from tisph_tpu.ops.neighbors import SweepConfig


def _make_mesh_nd(sizes, axes) -> Mesh:
    devs = jax.devices()
    need = int(np.prod(sizes))
    if len(devs) < need:
        devs = jax.devices("cpu")
    if len(devs) < need:
        raise ValueError(
            f"need {need} devices, have {len(devs)} "
            "(set XLA_FLAGS=--xla_force_host_platform_device_count=N)"
        )
    return Mesh(np.asarray(devs[:need]).reshape(*sizes), axes)


def make_mesh2d(sx: int, sy: int, axes=("sx", "sy")) -> Mesh:
    """(sx × sy) mesh over the default backend's devices; falls back to the
    virtual CPU platform when it has too few (same contract as
    domain.make_mesh)."""
    return _make_mesh_nd((sx, sy), axes)


def make_mesh3d(sx: int, sy: int, sz: int, axes=("sx", "sy", "sz")) -> Mesh:
    """(sx × sy × sz) mesh — the 3-axis rectangle decomposition (one more
    exchange stage than the 2-D one; see ShardedWCSPHRect)."""
    return _make_mesh_nd((sx, sy, sz), axes)


# particle-state payload: every per-particle field rides migrations and
# halo exchanges as one (rows, C) f32 matrix (lossless bitcasts for the
# i32 columns) so each hop is ONE ppermute
_PAYLOAD = ("x", "v", "density", "pressure", "mass", "volume", "material",
            "color", "object_id")
# fields the sweeps consume (pack_state operands)
_FIELD_KEYS = ("x", "v", "density", "pressure", "mass", "volume", "material")


def _payload_layout(state: SimState):
    """[(name, n_components, dtype)] for the 1-D column split."""
    out = []
    for name in _PAYLOAD:
        a = getattr(state, name)
        out.append((name, 1 if a.ndim == 1 else a.shape[1], a.dtype))
    return out


def _f32(c):
    return (c if c.dtype == jnp.float32
            else jax.lax.bitcast_convert_type(c, jnp.float32))


class ShardedWCSPHRect(SolverBase):
    """WCSPH over a 2- or 3-axis rectangle-decomposition device mesh
    (seg pallas layout only).

    Same physics as WCSPH / ShardedWCSPH (shared pair kernels and seg
    sweeps); per-axis quantile-cut rectangle (or box) ownership with
    buffered per-axis migration + an (n_ax)-stage corner-covering halo
    exchange, last axis first — each earlier stage's select pool includes
    the halo rows already received from the later-staged axes, so corner
    (and 3-axis double-corner) cells ride through.  ``ShardedWCSPH2D`` is
    the 2-axis alias.
    """

    def __init__(
        self,
        scene: SceneConfig,
        mesh: Mesh,
        compat: str = "reference",
        params: SolverParams | None = None,
        sweep_cfg: SweepConfig | None = None,
        balance_slack: float = 1.5,
        buffer_slack: float = 2.0,
        emit_frac: float = 0.9,
        boundary_mode: str | None = None,
    ):
        if boundary_mode is None:
            # rigid scenes need per-substep Akinci volume recomputes
            boundary_mode = (
                "per_step"
                if any(rb.is_dynamic for rb in scene.rigid_bodies)
                else "static"
            )
        super().__init__(scene, compat=compat, params=params,
                         sweep_cfg=sweep_cfg, boundary_mode=boundary_mode)
        if scene.dim < 2:
            raise ValueError("rectangle decomposition needs dim >= 2")
        n_ax = len(mesh.axis_names)
        if n_ax not in (2, 3):
            raise ValueError(
                f"need a 2- or 3-axis mesh, got {mesh.axis_names}"
            )
        if n_ax > scene.dim:
            raise ValueError(
                f"a {n_ax}-axis mesh cuts the first {n_ax} grid axes; "
                f"the scene has dim={scene.dim}"
            )
        self.mesh = mesh
        self.n_ax = n_ax
        self._letters = "xyz"[:n_ax]
        self.axes = list(mesh.axis_names)
        self.sizes = [int(s) for s in mesh.devices.shape]
        self.ax_x, self.ax_y = self.axes[0], self.axes[1]
        self.Sx, self.Sy = self.sizes[0], self.sizes[1]
        if n_ax == 3:
            self.ax_z, self.Sz = self.axes[2], self.sizes[2]
        self.n_shards = int(np.prod(self.sizes))
        self.balance_slack = float(balance_slack)
        self.buffer_slack = float(buffer_slack)
        # emitters fire only while every shard's active count stays under
        # emit_frac * shard_rows — the same threshold run() rebalances at,
        # so emission never consumes the migration headroom whose loss
        # would make the next rebuild's fixed cut drop rows (see
        # _maybe_emit); skipped batches surface as a cadence mismatch in
        # EmitterState.emitted
        self.emit_frac = float(emit_frac)
        self._sharding = NamedSharding(mesh, P(tuple(self.axes)))
        self._replicated = NamedSharding(mesh, P())
        self._shard_rows: int | None = None
        # per-axis halo / migration buffer capacities (rows; resolved at
        # bind, doubled by regrow_buffers when occ_halo trips) and cut
        # tables (static jnp constants rebuilt by rebalance()):
        #   cap_h{x,y,z} / cap_m{x,y,z}: int | None
        #   _tbl_s{x,y,z}: (res_a,) i32 -> shard index along axis a
        #   _{x,y,z}lo / _{x,y,z}hi: (S_a,) i32 cell bounds [lo, hi)
        for L in self._letters:
            setattr(self, f"cap_h{L}", None)
            setattr(self, f"cap_m{L}", None)
            setattr(self, f"_tbl_s{L}", None)
            setattr(self, f"_{L}lo", None)
            setattr(self, f"_{L}hi", None)

    # -- per-axis accessors (the named attributes are the public surface,
    #    kept for the 2-axis call sites; internals index by axis) --------
    def _tbl(self, a):
        return getattr(self, f"_tbl_s{self._letters[a]}")

    def _lo_t(self, a):
        return getattr(self, f"_{self._letters[a]}lo")

    def _hi_t(self, a):
        return getattr(self, f"_{self._letters[a]}hi")

    def _cap_h(self, a):
        return getattr(self, f"cap_h{self._letters[a]}")

    def _cap_m(self, a):
        return getattr(self, f"cap_m{self._letters[a]}")

    def _perms(self, a):
        """(fwd, bwd) ppermute pairs along mesh axis ``a``."""
        S = self.sizes[a]
        fwd = [(i, i + 1) for i in range(S - 1)]
        bwd = [(i + 1, i) for i in range(S - 1)]
        return fwd, bwd

    def _linear_shard(self, ss):
        """Row-major linear shard index from per-axis indices."""
        idx = ss[0]
        for a in range(1, self.n_ax):
            idx = idx * self.sizes[a] + ss[a]
        return idx

    # ------------------------------------------------------------------
    # bind: caps, cuts, distribution
    # ------------------------------------------------------------------
    def bind(self, state: SimState) -> SimState:
        if self.spec is None or self.sweep_cfg is None:
            probe = self.spec if self.spec is not None else self._make_spec(run_cap=8)
            block = self.sweep_cfg.block_size if self.sweep_cfg is not None else 128
            run_len, window, _ = gridops.measure_caps_device(state, probe, block)
        if self.spec is None:
            self.spec = self._make_spec(max(8, -(-int(run_len * 1.5) // 8) * 8))
        if self.sweep_cfg is None:
            wcap = max(128, -(-int(window * 1.5) // 128) * 128)
            platform = self.mesh.devices.ravel()[0].platform
            tile = 128 if self.scene.dim == 2 else 256
            self.sweep_cfg = SweepConfig(
                impl="pallas", block_size=block, window_cap=wcap,
                layout="seg", tile=tile, interpret=(platform != "tpu"),
            )
        cfg = self.sweep_cfg
        if cfg.impl != "pallas" or cfg.layout != "seg":
            raise NotImplementedError(
                "ShardedWCSPHRect implements the pallas seg layout only"
            )
        if cfg.sub_slabs != 1:
            raise NotImplementedError("ShardedWCSPHRect supports sub_slabs=1")
        import dataclasses as _dc

        wcap = int(-(-(cfg.window_cap + 128) // cfg.tile) * cfg.tile)
        if wcap != cfg.window_cap:
            self.sweep_cfg = cfg = _dc.replace(cfg, window_cap=wcap)
        if self.spec.num_cells >= 2**24:
            raise ValueError("pallas sweep needs num_cells < 2**24")
        res = self.spec.res
        if any(int(res[a]) < self.sizes[a] for a in range(self.n_ax)):
            raise ValueError(
                f"grid {res} too small for a "
                f"{'x'.join(map(str, self.sizes))} mesh"
            )
        if self.boundary_mode == "static":
            state = self._precompute_boundary_volumes(state)

        # per-shard row budget: cuts are cell-granular, so on coarse grids
        # the equal-count quantiles can land a multiple of the mean in one
        # rectangle — size rows from the MEASURED worst shard of the
        # bind-time distribution (x slack for drift), not from the mean
        block = cfg.block_size
        self._make_cuts(state)
        worst0 = int(jax.device_get(jnp.max(self._count_shards(state))))
        mean = -(-state.capacity // self.n_shards)
        rows = max(int(worst0 * max(self.balance_slack, 1.1)),
                   int(mean * self.balance_slack),
                   max(cfg.window_cap, block + 256))
        rows = -(-rows // block) * block
        self._shard_rows = rows
        cap2 = rows * self.n_shards
        if cap2 != state.capacity:
            from tisph_tpu.models.state import pad_state_capacity

            state = pad_state_capacity(state, cap2)
        if cfg.pad_capacity <= 0:
            blocks = -(-rows // block)
            self.sweep_cfg = cfg = _dc.replace(
                cfg, pad_capacity=(int(blocks * 1.3) + 256) * block
            )

        state, counts = self._distribute(state)
        worst = int(jax.device_get(jnp.max(counts)))
        if worst > rows:
            raise ValueError(
                f"initial distribution overflows a shard ({worst} > "
                f"{rows} rows); raise balance_slack (= {self.balance_slack})"
            )
        self._measure_buffers(state)
        self._has_boundary = bool(
            jax.device_get(jnp.any(state.material == 0))
        )
        return self.shard_state(state)

    def shard_state(self, state: SimState) -> SimState:
        return jax.tree.map(
            lambda a: jax.device_put(
                a, self._sharding if getattr(a, "ndim", 0) >= 1 else self._replicated
            ),
            state,
        )

    # -- cut tables -----------------------------------------------------
    def _make_cuts(self, state: SimState) -> None:
        """Equal-count quantile cuts of the CURRENT distribution along
        every mesh axis (x slabs, y bands, z sheets).  Each axis's cuts
        are GLOBAL (identical across the other axes): misaligned per-slab
        bands would need halo rows from arbitrarily deep inside diagonal
        shards — rows a 1-layer, mesh-neighbor exchange provably cannot
        deliver — so alignment is a correctness requirement, not a
        simplification; residual imbalance is absorbed by balance_slack
        and the occ_shard-steered rebalance.  Only sum(S_a - 1) scalars
        cross the device->host boundary."""
        spec, n_ax, sizes = self.spec, self.n_ax, self.sizes

        @jax.jit
        def _cuts(st: SimState):
            coords = gridops.cell_coords(st.x, spec)
            act = st.material != MATERIAL_INVALID
            n_act = jnp.sum(act)
            big = jnp.int32(np.iinfo(np.int32).max)
            outs = []
            for a in range(n_ax):
                ca = jnp.sort(jnp.where(act, coords[:, a], big))
                qa = (jnp.arange(1, sizes[a]) * n_act) // sizes[a]
                outs.append(ca[jnp.clip(qa, 0, st.capacity - 1)])
            return tuple(outs)

        cuts_dev = jax.device_get(_cuts(state))

        def monotone(cuts, res):
            """Strictly increasing cuts in [1, res-1]: every slab/band must
            own >= 1 cell — an EMPTY slab breaks the mesh-adjacency =
            cell-adjacency contract the 1-hop halo/migration ppermutes
            rely on (cell-neighbor shards must be mesh neighbors)."""
            cuts = np.sort(cuts)
            k = len(cuts)
            if k == 0:
                return cuts
            for i in range(k):  # forward: strictly increasing, >= 1
                lo = 1 if i == 0 else cuts[i - 1] + 1
                cuts[i] = max(cuts[i], lo)
            for i in range(k - 1, -1, -1):  # backward: room for the rest
                hi = res - (k - i)
                cuts[i] = min(cuts[i], hi)
            assert (np.diff(cuts) > 0).all() and cuts[0] >= 1, cuts
            return cuts

        for a, L in enumerate(self._letters):
            res_a = int(spec.res[a])
            cuts = monotone(np.asarray(cuts_dev[a], np.int64), res_a)
            tbl = np.searchsorted(cuts, np.arange(res_a), side="right")
            b = np.concatenate([[0], cuts, [res_a]]).astype(np.int32)
            setattr(self, f"_tbl_s{L}", jnp.asarray(tbl, jnp.int32))
            setattr(self, f"_{L}lo", jnp.asarray(b[:-1]))
            setattr(self, f"_{L}hi", jnp.asarray(b[1:]))

    def _shard_of(self, coords: jax.Array, act: jax.Array):
        """Per-axis shard indices of each particle's cell (inactive rows
        get 0 on every axis — callers mask)."""
        out = []
        for a in range(self.n_ax):
            tbl = self._tbl(a)
            s = tbl[jnp.clip(coords[:, a], 0, tbl.shape[0] - 1)]
            out.append(jnp.where(act, s, jnp.zeros_like(s)))
        return tuple(out)

    def _count_shards(self, state: SimState) -> jax.Array:
        """(n_shards,) active-particle counts under the current cuts."""
        spec = self.spec

        @jax.jit
        def _go(st: SimState):
            coords = gridops.cell_coords(st.x, spec)
            act = st.material != MATERIAL_INVALID
            ss = self._shard_of(coords, act)
            return jax.ops.segment_sum(
                act.astype(jnp.int32), self._linear_shard(ss),
                num_segments=self.n_shards,
            )

        return _go(state)

    # -- initial / rebalance distribution --------------------------------
    def _distribute(self, state: SimState):
        """Global (shard, id) sort + gather into fixed per-shard slots.
        Returns (state with per-shard layout, per-shard active counts)."""
        spec, rows = self.spec, self._shard_rows
        S = self.n_shards

        @jax.jit
        def _go(st: SimState):
            coords = gridops.cell_coords(st.x, spec)
            ids = gridops.flat_cell_ids(coords, st.material, spec)
            act = ids < spec.num_cells
            ss = self._shard_of(coords, act)
            shard = jnp.where(act, self._linear_shard(ss), S)
            iota = jnp.arange(st.capacity, dtype=jnp.int32)
            sh_s, ids_s, perm = jax.lax.sort(
                (shard, ids, iota), num_keys=2, is_stable=True
            )
            starts = jnp.searchsorted(
                sh_s, jnp.arange(S + 1, dtype=jnp.int32), side="left"
            ).astype(jnp.int32)
            counts = starts[1:] - starts[:-1]
            q = jnp.arange(st.capacity, dtype=jnp.int32)
            s_q, r_q = q // rows, q % rows
            src_sorted = starts[s_q] + r_q
            valid = r_q < counts[s_q]
            src = jnp.where(valid, perm[jnp.clip(src_sorted, 0, st.capacity - 1)], 0)

            def place(a):
                if getattr(a, "ndim", 0) < 1:
                    return a
                out = jnp.take(a, src, axis=0)
                fill = MATERIAL_INVALID if jnp.issubdtype(a.dtype, jnp.integer) else 0
                v = valid if a.ndim == 1 else valid[:, None]
                return jnp.where(v, out, fill)

            new = {
                f.name: place(getattr(st, f.name))
                for f in dataclasses.fields(st)
                if getattr(getattr(st, f.name), "ndim", 0) >= 1
            }
            return dataclasses.replace(st, **new), counts

        return _go(state)

    def _measure_buffers(self, state: SimState) -> None:
        """Halo / migration buffer row caps from the worst shard's 1-cell
        boundary layers of the CURRENT distribution (device-side counts;
        regrow_buffers doubles them when occ_halo trips at runtime).

        HALO stage ``a``'s select pool is [own rows ∥ halos received from
        every LATER-staged axis b > a] — the exchange runs last-axis-first,
        so e.g. the x stage selects from (own ∥ z-halo ∥ y-halo).
        Measuring own edge rows alone undercounts by the corner share and
        silently drops corner cells when the buffer clips (the round-5 2x4
        divergence bug: m_xp = 450 > cap 384 measured own-only).  The
        general pool sums, over every subset T of the ride axes and every
        direction assignment, the count of rows in a's edge layer AND all
        of T's edge layers, shifted to the receiving shard — for 3 axes
        the x halo pool carries the 4 double-corner (rode z THEN y) terms.

        MIGRATION runs in the OPPOSITE stage order (first-axis-first,
        x -> y -> z: _seg_build's migration loop), so axis a's migration
        pool rides the EARLIER axes b < a: a diagonal migrant crosses the
        x cut in the x phase, arrives, and is selected AGAIN by the y
        phase from the received rows.  Sizing cap_m from the halo
        (later-axis) pool would undercount the last migration axis by
        exactly the corner share the halo fix added — the same bug class
        in the reverse orientation."""
        from itertools import combinations, product as _iproduct

        spec, n_ax, sizes = self.spec, self.n_ax, self.sizes

        @jax.jit
        def _layers(st: SimState):
            coords = gridops.cell_coords(st.x, spec)
            act = st.material != MATERIAL_INVALID
            ss = self._shard_of(coords, act)
            shard = self._linear_shard(ss)

            def counts(mask):
                return jax.ops.segment_sum(
                    mask.astype(jnp.int32), shard,
                    num_segments=self.n_shards,
                ).reshape(tuple(sizes))

            def edge(a, d):
                c_a = coords[:, a]
                if d > 0:  # top layer: rides to the a+1 neighbor
                    return act & (c_a == self._hi_t(a)[ss[a]] - 1)
                return act & (c_a == self._lo_t(a)[ss[a]])

            def shift(arr, b, db):
                # sender (.., i, ..) -> receiver (.., i + db, ..) along b
                if db > 0:
                    dst = tuple(slice(1, None) if i == b else slice(None)
                                for i in range(n_ax))
                    src = tuple(slice(0, -1) if i == b else slice(None)
                                for i in range(n_ax))
                else:
                    dst = tuple(slice(0, -1) if i == b else slice(None)
                                for i in range(n_ax))
                    src = tuple(slice(1, None) if i == b else slice(None)
                                for i in range(n_ax))
                return jnp.zeros_like(arr).at[dst].set(arr[src])

            def pool_worst(a, ride):
                """Worst-shard pool for a stage along axis ``a`` whose
                select source includes rows ridden in from ``ride``."""
                worst = []
                for d_a in (1, -1):
                    pool = jnp.zeros(tuple(sizes), jnp.int32)
                    for r in range(len(ride) + 1):
                        for T in combinations(ride, r):
                            for dirs in _iproduct((1, -1), repeat=r):
                                m = edge(a, d_a)
                                for b, db in zip(T, dirs):
                                    m = m & edge(b, db)
                                c = counts(m)
                                for b, db in zip(T, dirs):
                                    c = shift(c, b, db)
                                pool = pool + c
                    worst.append(jnp.max(pool))
                return jnp.maximum(worst[0], worst[1])

            caps_h = [pool_worst(a, list(range(a + 1, n_ax)))
                      for a in range(n_ax)]
            caps_m = [pool_worst(a, list(range(a)))
                      for a in range(n_ax)]
            return tuple(caps_h), tuple(caps_m)

        vh, vm = jax.device_get(_layers(state))
        sl = self.buffer_slack

        def cap(v):
            return max(128, -(-int(int(v) * sl) // 128) * 128)

        for a, L in enumerate(self._letters):
            setattr(self, f"cap_h{L}", cap(vh[a]))
            setattr(self, f"cap_m{L}", cap(vm[a]))

    # ------------------------------------------------------------------
    # shard-local helpers (traced inside shard_map)
    # ------------------------------------------------------------------
    def _stack(self, chans):
        """list of (n,) columns -> (n, C) f32 (lossless bitcasts)."""
        return jnp.stack([_f32(c) for c in chans], axis=1)

    def _cols_of(self, mat, dtypes):
        out = []
        for k, dt in enumerate(dtypes):
            c = mat[:, k]
            out.append(c if dt == jnp.float32
                       else jax.lax.bitcast_convert_type(c, dt))
        return out

    @staticmethod
    def _select_rows(mat, mask, cap, id_col, mat_col):
        """Compact the masked rows of ``mat`` into a (cap, C) buffer.
        Invalid lanes get sentinel-id / INVALID-material columns (values
        are clamped junk — masked-lane garbage by design).  Returns
        (buffer, gather_idx, sent_mask, overflow_rows): ``sent_mask``
        marks exactly the source rows the buffer carries — migration MUST
        neutralize only those (neutralizing every masked row would
        silently DESTROY the overflow rows beyond ``cap``; leaving them in
        place turns buffer overflow into a flagged one-rebuild delay)."""
        n = mat.shape[0]
        big = jnp.int32(np.iinfo(np.int32).max)
        iota = jnp.arange(n, dtype=jnp.int32)
        key = jnp.where(mask, iota, big)
        sk, si = jax.lax.sort_key_val(key, iota, is_stable=True)
        idx = si[:cap]
        valid = sk[:cap] < big
        buf = jnp.take(mat, idx, axis=0)
        ids = jax.lax.bitcast_convert_type(buf[:, id_col], jnp.int32)
        mats = jax.lax.bitcast_convert_type(buf[:, mat_col], jnp.int32)
        buf = buf.at[:, id_col].set(_f32(jnp.where(valid, ids, big)))
        buf = buf.at[:, mat_col].set(
            _f32(jnp.where(valid, mats, MATERIAL_INVALID))
        )
        sent = jnp.zeros((n,), bool).at[idx].set(valid, mode="drop")
        ovf = jnp.maximum(jnp.sum(mask.astype(jnp.int32)) - cap, 0)
        return buf, idx, sent, ovf

    def _neutralize(self, buf, has_sender, id_col, mat_col):
        """Zero-filled ppermute results on mesh-edge shards decode as cell
        id 0 / material BOUNDARY — force their id/material columns inert."""
        big = jnp.int32(np.iinfo(np.int32).max)
        ids = jax.lax.bitcast_convert_type(buf[:, id_col], jnp.int32)
        mats = jax.lax.bitcast_convert_type(buf[:, mat_col], jnp.int32)
        buf = buf.at[:, id_col].set(_f32(jnp.where(has_sender, ids, big)))
        buf = buf.at[:, mat_col].set(
            _f32(jnp.where(has_sender, mats, MATERIAL_INVALID))
        )
        return buf

    # ------------------------------------------------------------------
    # build / apply (the _seg protocol SolverBase.rollout amortizes)
    # ------------------------------------------------------------------
    def _seg_build(self, state: SimState):
        from tisph_tpu.ops.pallas import sweeps as ps

        spec, scfg = self.spec, self.sweep_cfg
        n_ax, sizes, names = self.n_ax, self.sizes, self.axes
        rows = self._shard_rows
        block = scfg.block_size
        block_cap = scfg.pad_capacity // block
        caps_h = [self._cap_h(a) for a in range(n_ax)]
        caps_m = [self._cap_m(a) for a in range(n_ax)]
        perms = [self._perms(a) for a in range(n_ax)]
        axes_t = tuple(names)
        pspec = P(axes_t)
        layout = _payload_layout(state)
        dtypes = []
        col_ix = {}
        for name, k, dt in layout:
            col_ix[name] = len(dtypes) + 1  # +1: ids ride column 0
            dtypes.extend([dt] * k)
        dtypes = [jnp.int32] + dtypes  # ids column
        IDC = 0
        MATC = col_ix["material"]
        XC = col_ix["x"]
        dim = state.dim
        big = jnp.int32(np.iinfo(np.int32).max)
        sentinel = spec.num_cells

        def cols_of_state(st):
            out = []
            for name, k, _ in layout:
                a = getattr(st, name)
                out.extend([a] if a.ndim == 1 else [a[:, c] for c in range(k)])
            return out

        def decode(mat):
            """(ids, coords, material) from a payload matrix."""
            ids = jax.lax.bitcast_convert_type(mat[:, IDC], jnp.int32)
            x = mat[:, XC:XC + dim]
            coords = gridops.cell_coords(x, spec)
            material = jax.lax.bitcast_convert_type(mat[:, MATC], jnp.int32)
            return ids, coords, material

        def migrate_axis(mat, d, a):
            """Move rows with d==+1 / d==-1 to the ring neighbors along
            mesh axis ``a`` via two fixed-cap buffers; departed rows are
            neutralized in place, received buffers appended.  Returns
            ((n+2*cap, C) matrix, overflow_rows)."""
            act = jax.lax.bitcast_convert_type(mat[:, IDC], jnp.int32) < sentinel
            m_p = act & (d == 1)
            m_m = act & (d == -1)
            buf_p, _, sent_p, ovf_p = self._select_rows(mat, m_p, caps_m[a],
                                                        IDC, MATC)
            buf_m, _, sent_m, ovf_m = self._select_rows(mat, m_m, caps_m[a],
                                                        IDC, MATC)
            # neutralize exactly the rows the buffers carry — an overflow
            # row stays in place (wrong shard for one more rebuild,
            # counted in occ_resort) instead of being destroyed
            gone = sent_p | sent_m
            ids0 = jax.lax.bitcast_convert_type(mat[:, IDC], jnp.int32)
            mats0 = jax.lax.bitcast_convert_type(mat[:, MATC], jnp.int32)
            mat = mat.at[:, IDC].set(_f32(jnp.where(gone, big, ids0)))
            mat = mat.at[:, MATC].set(
                _f32(jnp.where(gone, MATERIAL_INVALID, mats0))
            )
            idx = jax.lax.axis_index(names[a])
            fwd, bwd = perms[a]
            in_p = jax.lax.ppermute(buf_p, names[a], fwd)   # from idx-1
            in_m = jax.lax.ppermute(buf_m, names[a], bwd)   # from idx+1
            in_p = self._neutralize(in_p, idx - 1 >= 0, IDC, MATC)
            in_m = self._neutralize(in_m, idx + 1 < sizes[a], IDC, MATC)
            return jnp.concatenate([mat, in_p, in_m]), ovf_p + ovf_m

        n_cols = len(cols_of_state(state))
        out_specs = (
            (pspec,) * n_cols             # kept state columns
            + (pspec,) * (3 + 2 * n_ax)   # ids_l, 2 halo idx per axis,
            #                               perm_e, ids_e
            + (ps.SegMeta(pspec, pspec, pspec), pspec)  # meta, back_valid
            + (P(),) * 5                  # need, pad_need, cnt, anom, ovf
        )

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(pspec,) * n_cols, out_specs=out_specs,
                 check_vma=False)
        def build_shard(*cols_l):
            my = [jax.lax.axis_index(names[a]) for a in range(n_ax)]
            # assemble payload (+ids col 0)
            xs = jnp.stack(cols_l[XC - 1:XC - 1 + dim], axis=1)
            material = cols_l[MATC - 1]
            coords = gridops.cell_coords(xs, spec)
            ids = gridops.flat_cell_ids(coords, material, spec)
            mat0 = self._stack([ids, *cols_l])

            # ---- migration (one buffered phase per axis, x -> y -> z;
            # a diagonal migrant rides every phase it needs) ----
            mat2 = mat0
            anom = jnp.zeros((), jnp.int32)
            ovf_mig = jnp.zeros((), jnp.int32)
            for a in range(n_ax):
                ids_c, coords_c, _ = decode(mat2)
                act_c = ids_c < sentinel
                ts = self._shard_of(coords_c, act_c)
                d = jnp.where(act_c, ts[a] - my[a], 0)
                anom = anom + jnp.sum((jnp.abs(d) > 1).astype(jnp.int32))
                mat2, ovf = migrate_axis(mat2, jnp.clip(d, -1, 1), a)
                ovf_mig = ovf_mig + ovf

            # ---- local sort by cell id + fixed cut ----
            ids2 = jax.lax.bitcast_convert_type(mat2[:, IDC], jnp.int32)
            # neutralized/invalid rows carry i32max — remap to the grid
            # sentinel so downstream bounds stay in [0, num_cells]
            ids2 = jnp.where(ids2 >= sentinel, sentinel, ids2)
            iota2 = jnp.arange(mat2.shape[0], dtype=jnp.int32)
            ids_s, si = jax.lax.sort_key_val(ids2, iota2, is_stable=True)
            kept = jnp.take(mat2, si[:rows], axis=0)
            ids_l = ids_s[:rows]
            kept = kept.at[:, IDC].set(_f32(ids_l))
            cnt = jnp.sum((ids2 < sentinel).astype(jnp.int32))

            # ---- seg plan over the local rows ----
            bounds_l = gridops.csr_bounds_fast(
                ids_l, spec, interpret=scfg.interpret
            )
            plan = gridops.seg_plan(ids_l, spec, block, block_cap,
                                    bounds=bounds_l)

            # ---- halo: last axis first (z, then y over own ∥ z-halo,
            # then x over own ∥ z ∥ y halos — corners and double-corners
            # ride the earlier-received buffers through later stages) ----
            cat = kept
            idx_list = []
            ovf_h = jnp.zeros((), jnp.int32)
            for a in range(n_ax - 1, -1, -1):
                ids_c, coords_c, _ = decode(cat)
                act_c = ids_c < sentinel
                hi_a = self._hi_t(a)[my[a]]
                lo_a = self._lo_t(a)[my[a]]
                m_p = act_c & (coords_c[:, a] == hi_a - 1)
                m_m = act_c & (coords_c[:, a] == lo_a)
                buf_p, idx_p, _, o1 = self._select_rows(cat, m_p, caps_h[a],
                                                        IDC, MATC)
                buf_m, idx_m, _, o2 = self._select_rows(cat, m_m, caps_h[a],
                                                        IDC, MATC)
                fwd, bwd = perms[a]
                in_p = jax.lax.ppermute(buf_p, names[a], fwd)
                in_m = jax.lax.ppermute(buf_m, names[a], bwd)
                in_p = self._neutralize(in_p, my[a] - 1 >= 0, IDC, MATC)
                in_m = self._neutralize(in_m, my[a] + 1 < sizes[a], IDC, MATC)
                cat = jnp.concatenate([cat, in_p, in_m])
                idx_list.extend([idx_p, idx_m])
                ovf_h = ovf_h + o1 + o2
            ext = cat

            # ---- id-merge of the extended array ----
            ids_ext = jax.lax.bitcast_convert_type(ext[:, IDC], jnp.int32)
            ids_ext = jnp.where(ids_ext >= sentinel, sentinel, ids_ext)
            iota_e = jnp.arange(ext.shape[0], dtype=jnp.int32)
            ids_e, perm_e = jax.lax.sort_key_val(ids_ext, iota_e,
                                                 is_stable=True)
            bounds_e = gridops.csr_bounds_fast(
                ids_e, spec, interpret=scfg.interpret
            )
            meta, need = ps.seg_block_meta(
                plan, ids_e, spec, block, scfg.window_cap, bounds=bounds_e,
                sub=1, own_ids=ids_l,
            )

            # ---- fold diagnostics over the whole mesh ----
            need = jax.lax.pmax(need.astype(jnp.int32), axes_t)
            pad_need = jax.lax.pmax(
                (plan.need_blocks * block).astype(jnp.int32), axes_t
            )
            cnt = jax.lax.pmax(cnt, axes_t)
            anom = jax.lax.pmax(anom + ovf_mig, axes_t)
            ovf = jax.lax.pmax(ovf_h, axes_t)

            kept_cols = tuple(self._cols_of(kept[:, 1:], dtypes[1:]))
            return (kept_cols
                    + (ids_l,) + tuple(idx_list) + (perm_e, ids_e)
                    + (meta, plan.back_valid)
                    + (need, pad_need, cnt, anom, ovf))

        outs = build_shard(*cols_of_state(state))
        kept_cols = outs[:n_cols]
        rest = outs[n_cols:]
        ids_l = rest[0]
        idxs = rest[1:1 + 2 * n_ax]
        perm_e, ids_e = rest[1 + 2 * n_ax:3 + 2 * n_ax]
        (meta, back_valid, need, pad_need, cnt, anom, ovf) = rest[3 + 2 * n_ax:]

        # rebuild state fields from the kept columns
        new_fields = {}
        o = 0
        for name, k, _ in layout:
            cs = kept_cols[o:o + k]
            o += k
            new_fields[name] = cs[0] if k == 1 else jnp.stack(cs, axis=1)
        state = dataclasses.replace(state, **new_fields)
        state = jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(
                a, self._sharding if getattr(a, "ndim", 0) >= 1 else self._replicated
            ),
            state,
        )
        state = self._track_occ(state, need)
        state = dataclasses.replace(
            state,
            occ_rowpad=jnp.maximum(
                jnp.asarray(state.occ_rowpad, jnp.int32), pad_need
            ),
            occ_shard=jnp.maximum(
                jnp.asarray(state.occ_shard, jnp.int32), cnt
            ),
            occ_resort=jnp.asarray(state.occ_resort, jnp.int32)
            + (anom > 0).astype(jnp.int32),
            occ_halo=jnp.maximum(
                jnp.asarray(state.occ_halo, jnp.int32), (ovf > 0).astype(jnp.int32)
            ),
        )
        cache = (meta, back_valid, ids_l, ids_e, perm_e, *idxs)
        return state, cache

    def _exchange_sweep(self, state: SimState, cache, mode: str):
        """One halo-refreshed sweep against the cached structure:
        cached-index value gathers + 2 buffer ppermutes per mesh axis
        (last axis first, the _seg_build stage order), cached merge
        permutation, then the seg kernel with the local pack as the
        separate i side.  Modes: 'density', 'force', and the rigid
        pipeline's 'bvol' / 'force_react'."""
        from tisph_tpu.ops.pallas import sweeps as ps

        spec, params, scfg = self.spec, self.params, self.sweep_cfg
        n_ax, names = self.n_ax, self.axes
        (meta, back_valid, ids_l, ids_e, perm_e, *idxs) = cache
        pspec = P(tuple(names))
        perms = [self._perms(a) for a in range(n_ax)]
        kw = dict(tile=scfg.tile, interpret=scfg.interpret,
                  fast_math=scfg.fast_math)

        def sweep_shard(ids_l_c, ids_e_c, perm_e_c, *rest):
            idx_c = rest[:2 * n_ax]
            meta_c, bval = rest[2 * n_ax], rest[2 * n_ax + 1]
            fields = rest[2 * n_ax + 2:]
            f_local = dict(zip(_FIELD_KEYS, fields))
            cols = []
            for k in _FIELD_KEYS:
                a = f_local[k]
                cols.extend([a] if a.ndim == 1 else
                            [a[:, c] for c in range(a.shape[1])])
            dts = [c.dtype for c in cols]
            cat = self._stack(cols)
            # stale values on the edge shards' wrap-around buffers are
            # harmless: the cached ids_e marks those rows inactive
            for i, a in enumerate(range(n_ax - 1, -1, -1)):
                ip, im = idx_c[2 * i], idx_c[2 * i + 1]
                fwd, bwd = perms[a]
                in_p = jax.lax.ppermute(jnp.take(cat, ip, axis=0),
                                        names[a], fwd)
                in_m = jax.lax.ppermute(jnp.take(cat, im, axis=0),
                                        names[a], bwd)
                cat = jnp.concatenate([cat, in_p, in_m])
            ext = jnp.take(cat, perm_e_c, axis=0)
            ecols = self._cols_of(ext, dts)
            f_ext, o = {}, 0
            for k in _FIELD_KEYS:
                w = 1 if f_local[k].ndim == 1 else f_local[k].shape[1]
                f_ext[k] = (ecols[o] if w == 1
                            else jnp.stack(ecols[o:o + w], axis=1))
                o += w
            pack_ext = ps.pack_state(
                f_ext["x"], f_ext["v"], f_ext["density"], f_ext["pressure"],
                f_ext["mass"], f_ext["volume"], f_ext["material"], ids_e_c,
                params,
            )
            pack_own = ps.pack_state(
                f_local["x"], f_local["v"], f_local["density"],
                f_local["pressure"], f_local["mass"], f_local["volume"],
                f_local["material"], ids_l_c, params,
            )
            fn = {"density": ps.density_sweep_seg,
                  "force": ps.force_sweep_seg,
                  "bvol": ps.bvol_sweep_seg,
                  "force_react": ps.force_react_sweep_seg}[mode]
            out = fn(pack_ext, meta_c, spec, params, scfg.block_size,
                     scfg.window_cap, ipack=pack_own, **kw)
            fluid = f_local["material"] == 1
            bd = f_local["material"] == 0
            if mode == "density":
                return jnp.where(bval & fluid, out, f_local["density"])
            if mode == "bvol":
                return jnp.where(bval & bd,
                                 1.0 / jnp.maximum(out, 1e-10),
                                 f_local["volume"])
            if mode == "force_react":
                return jnp.where((bval & (fluid | bd))[:, None], out, 0.0)
            return jnp.where((bval & fluid)[:, None], out, 0.0)

        meta_spec = ps.SegMeta(pspec, pspec, pspec)
        in_specs = ((pspec,) * (3 + 2 * n_ax) + (meta_spec, pspec)
                    + (pspec,) * len(_FIELD_KEYS))

        @partial(jax.shard_map, mesh=self.mesh, in_specs=in_specs,
                 out_specs=pspec, check_vma=False)
        def shard(*args):
            return sweep_shard(*args)

        f = F.state_fields(state)
        return shard(
            ids_l, ids_e, perm_e, *idxs,
            meta, back_valid, *[f[k] for k in _FIELD_KEYS],
        )

    def _seg_apply(self, state: SimState, cache) -> SimState:
        """One fluid physics substep against the cached structure
        (×2 value exchanges around the EOS barrier)."""
        params = self.params
        if self.boundary_mode == "per_step":
            # per-substep Akinci volume recompute, matching the single-chip
            # plain step (models/wcsph.py::_seg_apply_pack) — bind skips the
            # static precompute in this mode, so skipping the sweep here
            # would freeze boundary rows at build_state's uniform volume0
            volume = self._exchange_sweep(state, cache, "bvol")
            state = dataclasses.replace(state, volume=volume)
        density = self._exchange_sweep(state, cache, "density")
        rho, pressure = tait_pressure(
            density, params.density0, params.stiffness, params.exponent
        )
        state = dataclasses.replace(state, density=rho, pressure=pressure)
        d_velocity = self._exchange_sweep(state, cache, "force")
        state = F.advect(state, d_velocity, params)
        return F.enforce_domain_boundary(state, params)

    def _step_fn(self, state: SimState) -> SimState:
        state, cache = self._seg_build(state)
        return self._seg_apply(state, cache)

    # ------------------------------------------------------------------
    # emitter inflow over the 2-D mesh
    # ------------------------------------------------------------------
    def _maybe_emit(self, state: SimState, es, volume0: float):
        """Per-shard tail emission (the 2-D analog of geometry/emitter.py's
        global tail pool): every shard's ``shard_rows`` chunk keeps its own
        inactive sentinel tail after the local id sort, so each shard
        activates exactly the seeds whose cell rectangle it OWNS into its
        local tail — placement lands in the owner shard directly, so the
        new rows never migrate at the next rebuild.  The fire decision is
        all-or-nothing across the mesh (``pmin`` of per-shard room) so the
        ``emitted`` counter stays exact and the cadence matches the 1-D /
        single-chip paths; an owner shard past ``emit_frac`` of its row
        budget therefore SKIPS the batch (flagged by the cadence mismatch
        in ``emitted``) until run()'s occ_shard-steered rebalance
        redistributes the load — filling a shard to exactly ``shard_rows``
        would leave no migrant headroom and the next rebuild's fixed cut
        drops rows.  Mid-R-group
        activations join the neighbor structure at the next group rebuild
        (<= R-1 substeps of ballistic flight — the same contract as
        SolverBase.rollout_emit's fused 1-D cadence)."""
        spec, rows = self.spec, self._shard_rows
        n_ax, names = self.n_ax, self.axes
        axes_t = tuple(names)
        pspec = P(axes_t)
        rspec = P()
        dim = state.dim
        B = es.batch_size

        due = jax.lax.rem(es.step, es.interval) == 0
        under_quota = jnp.where(
            es.max_particles > 0, es.emitted + B <= es.max_particles, True
        )
        maybe = due & under_quota

        # fire only while every shard stays under emit_frac of its row
        # budget: a fire that filled a shard to EXACTLY shard_rows would
        # leave zero headroom for migrants, and the next rebuild's fixed
        # cut silently drops whatever exceeds the budget (run() hard-errors
        # on occ_shard > shard_rows, but rollout_emit — the only emitter
        # entry point — never reads it).  The reserve aligns with run()'s
        # rebalance threshold: emission never pushes a shard into the
        # red zone the steering loop exists to drain.
        emit_rows = int(self.emit_frac * rows)

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(rspec,) * 5 + (pspec,) * len(_PAYLOAD),
                 out_specs=(pspec,) * len(_PAYLOAD) + (rspec,),
                 check_vma=False)
        def emit_shard(maybe_c, seeds, evel, ecol, eden,
                       x, v, density, pressure, mass, volume, material,
                       color, object_id):
            from tisph_tpu.geometry.emitter import activate_seeds

            my = [jax.lax.axis_index(names[a]) for a in range(n_ax)]
            coords = gridops.cell_coords(seeds, spec)
            ss = self._shard_of(coords, jnp.ones((B,), bool))
            owned = jnp.ones((B,), bool)
            for a in range(n_ax):
                owned = owned & (ss[a] == my[a])
            k = jnp.sum(owned.astype(jnp.int32))
            cnt = jnp.sum((material != MATERIAL_INVALID).astype(jnp.int32))
            room = jax.lax.pmin(
                ((cnt + k) <= emit_rows).astype(jnp.int32), axes_t
            )
            fire = maybe_c & (room > 0)
            idx = cnt + jnp.cumsum(owned.astype(jnp.int32)) - 1
            idx = jnp.where(owned & fire, idx, rows)  # mode='drop' discards
            fields = dict(x=x, v=v, density=density, pressure=pressure,
                          mass=mass, volume=volume, material=material,
                          color=color, object_id=object_id)
            out = activate_seeds(fields, idx, seeds, evel, ecol, eden,
                                 volume0, dim)
            return (*(out[f] for f in _PAYLOAD), fire.astype(jnp.int32))

        outs = emit_shard(
            maybe, es.seeds_x, es.velocity, es.color, es.density,
            state.x, state.v, state.density, state.pressure, state.mass,
            state.volume, state.material, state.color, state.object_id,
        )
        fire = outs[-1] > 0
        new_fields = dict(zip(
            ("x", "v", "density", "pressure", "mass", "volume", "material",
             "color", "object_id"), outs[:-1]
        ))
        state = dataclasses.replace(
            state,
            num_active=jnp.where(fire, state.num_active + B,
                                 state.num_active),
            **new_fields,
        )
        es2 = dataclasses.replace(
            es,
            emitted=jnp.where(fire, es.emitted + B, es.emitted),
            step=es.step + 1,
        )
        return state, es2

    # ------------------------------------------------------------------
    # dynamic rigid bodies over the 2-D mesh (two-way coupling)
    # ------------------------------------------------------------------
    def init_rigid(self, state: SimState):
        from tisph_tpu.models.rigid import make_rigid_state

        return make_rigid_state(state, self.scene)

    def _coupled_step_fn(self, carry):
        state, rigid = carry
        state, cache = self._seg_build(state)
        return self._coupled_apply((state, rigid), cache)

    def _coupled_apply(self, carry, cache):
        """Coupled substep on the 2-D mesh: per-substep Akinci volume +
        density + fused force_react exchanges, then the per-body
        reductions on the sharded arrays (GSPMD all-reduces — same scheme
        as ShardedWCSPH._coupled_apply)."""
        from tisph_tpu.models.rigid import integrate_rigid_fields

        state, rigid = carry
        params = self.params
        if self.boundary_mode != "per_step":
            raise ValueError("dynamic rigid bodies need boundary_mode="
                             "'per_step' (auto-selected for rigid scenes)")
        volume = self._exchange_sweep(state, cache, "bvol")
        state = dataclasses.replace(state, volume=volume)
        density = self._exchange_sweep(state, cache, "density")
        rho, pressure = tait_pressure(
            density, params.density0, params.stiffness, params.exponent
        )
        state = dataclasses.replace(state, density=rho, pressure=pressure)
        out = self._exchange_sweep(state, cache, "force_react")
        d_velocity = jnp.where(state.fluid_mask[:, None], out, 0.0)
        reactions = jnp.where(state.boundary_mask[:, None], out, 0.0)
        state = F.advect(state, d_velocity, params)
        x, v, rigid = integrate_rigid_fields(
            state.x, state.v, state.mass, state.object_id,
            state.boundary_mask, rigid, reactions, params,
        )
        state = dataclasses.replace(state, x=x, v=v)
        return F.enforce_domain_boundary(state, params), rigid

    def step_coupled(self, state: SimState, rigid):
        if self.spec is None:
            state = self.bind(state)
        if getattr(self, "_coupled_jit", None) is None:
            self._coupled_jit = jax.jit(self._coupled_step_fn)
        return self._coupled_jit((state, rigid))

    def rollout_coupled(self, state: SimState, rigid, num_steps: int):
        if self.spec is None:
            state = self.bind(state)
        R = self._amortize_R()
        if getattr(self, "_coupled_roll_jit", None) is None:
            if R > 1:
                def _roll(carry, n):
                    def outer(i, c):
                        st, cache = self._seg_build(c[0])
                        k = jnp.minimum(R, n - i * R)
                        return jax.lax.fori_loop(
                            0, k,
                            lambda _, c2: self._coupled_apply(c2, cache),
                            (st, c[1]),
                        )
                    return jax.lax.fori_loop(0, -(-n // R), outer, carry)
            else:
                def _roll(carry, n):
                    return jax.lax.fori_loop(
                        0, n, lambda _, c: self._coupled_step_fn(c), carry
                    )
            self._coupled_roll_jit = jax.jit(_roll, static_argnums=1)
        return self._coupled_roll_jit((state, rigid), num_steps)

    def run_coupled(self, state: SimState, rigid, num_steps: int, **kw):
        if self.spec is None:
            state = self.bind(state)
        return self._run_adaptive(
            (state, rigid), num_steps,
            lambda c, k: self.rollout_coupled(c[0], c[1], k),
            lambda c: c[0], lambda c, s: (s, c[1]), **kw
        )

    # ------------------------------------------------------------------
    # runtime adaptation
    # ------------------------------------------------------------------
    def regrow_buffers(self, factor: float = 2.0,
                       kinds: tuple[str, ...] = ("h", "m")) -> None:
        """Deepen the halo ('h') and/or migration ('m') buffer caps
        (occ_halo tripped: some 1-cell layer outgrew its buffer;
        occ_resort tripped: bulk migrants overflowed a migration buffer
        and were clamped in place for a rebuild) and drop compiled
        artifacts."""
        for L in self._letters:
            for kind in kinds:
                name = f"cap_{kind}{L}"
                v = int(getattr(self, name) * factor)
                setattr(self, name, max(128, -(-v // 128) * 128))
        for name in [k for k in vars(self) if k.endswith("_jit")]:
            setattr(self, name, None)

    def rebalance(self, state: SimState) -> SimState:
        """Re-cut the shard rectangles at the CURRENT distribution's
        quantiles and redistribute (occ_shard approaching shard_rows:
        the flow drifted from the bind-time cuts).  Host-side recompile;
        only quantile scalars cross the device boundary."""
        self._make_cuts(state)
        state, counts = self._distribute(state)
        worst = int(jax.device_get(jnp.max(counts)))
        if worst > self._shard_rows:
            raise RuntimeError(
                f"rebalance still overflows a shard ({worst} > "
                f"{self._shard_rows}); re-bind with a larger balance_slack"
            )
        self._measure_buffers(state)
        for name in [k for k in vars(self) if k.endswith("_jit")]:
            setattr(self, name, None)
        return self.shard_state(
            dataclasses.replace(state, occ_shard=jnp.zeros((), jnp.int32))
        )

    def run(
        self,
        state: SimState,
        num_steps: int,
        check_every: int = 400,
        grow: float = 1.5,
        verbose: bool = False,
        max_dispatch: int = 400,
        warn_frac: float = 0.9,
    ) -> SimState:
        """Chunked rollout with the 2-D adaptation loop: window/pad regrow
        (as 1-D), buffer regrow on occ_halo, quantile rebalance when
        occ_shard nears the per-shard row budget, hard error if the
        migration cut ever dropped a particle (occ_shard > shard_rows —
        by then state is corrupt, so this is an abort, not a retry)."""
        done = 0
        chunk = max(1, min(check_every, max_dispatch))
        while done < num_steps:
            k = min(chunk, num_steps - done)
            state = self.rollout(state, k)
            done += k
            occ_sh = int(jax.device_get(state.occ_shard))
            if occ_sh > self._shard_rows:
                raise RuntimeError(
                    f"2-D migration dropped particles: a shard needed "
                    f"{occ_sh} rows > budget {self._shard_rows}; rerun with "
                    "a larger balance_slack or more shards"
                )
            if occ_sh > warn_frac * self._shard_rows:
                if verbose:
                    print(f"[tisph] shard occupancy {occ_sh}/"
                          f"{self._shard_rows}; rebalancing cuts (recompile)")
                state = self.rebalance(state)
            if int(jax.device_get(state.occ_halo)):
                # occ_halo counts HALO-stage overflow only (migration
                # overflow rides occ_resort below) — deepen just the h caps
                old = tuple(self._cap_h(a) for a in range(self.n_ax))
                self.regrow_buffers(kinds=("h",))
                new = tuple(self._cap_h(a) for a in range(self.n_ax))
                if verbose:
                    print(f"[tisph] rect halo buffer overflow at "
                          f"caps {old}; deepened to {new} (recompile)")
            mig = int(jax.device_get(state.occ_resort))
            if mig:
                # clamped migration rows are lossless (they stay in place,
                # flagged, and home at a later rebuild) but each trip means
                # a rebuild ran with rows in the wrong shard — deepen the
                # migration buffers so bulk crossings fit next time.
                # (occ_resort counts REBUILDS that tripped, not rows.)
                old = tuple(self._cap_m(a) for a in range(self.n_ax))
                self.regrow_buffers(kinds=("m",))
                new = tuple(self._cap_m(a) for a in range(self.n_ax))
                if verbose:
                    print(f"[tisph] {mig} rebuilds with clamped/anomalous "
                          f"migration at m-caps {old}; deepened to {new} "
                          f"(recompile)")
            occ = int(jax.device_get(state.occ_window))
            cap = self._occ_cap()
            if cap and occ > warn_frac * cap:
                self.regrow(int(max(occ, cap) * grow))
                if verbose:
                    print(f"[tisph] window occupancy {occ} vs cap {cap}; "
                          f"re-capacitated to {self.sweep_cfg.window_cap}")
            pad_occ = int(jax.device_get(state.occ_rowpad))
            pad_cap = int(self.sweep_cfg.pad_capacity)
            if pad_cap and pad_occ > warn_frac * pad_cap:
                self.regrow(new_pad=int(max(pad_occ, pad_cap) * grow))
                if verbose:
                    print(f"[tisph] seg block occupancy {pad_occ} over cap "
                          f"{pad_cap}; re-capacitated")
            state = dataclasses.replace(
                state,
                occ_window=jnp.zeros((), jnp.int32),
                occ_halo=jnp.zeros((), jnp.int32),
                occ_rowpad=jnp.zeros((), jnp.int32),
                occ_resort=jnp.zeros((), jnp.int32),
                occ_shard=jnp.zeros((), jnp.int32),
            )
        return state

    def metrics(self, state: SimState) -> dict[str, jax.Array]:
        params = self.params
        cfg = self.sweep_cfg
        if getattr(self, "_metrics_jit", None) is None:
            @jax.jit
            def _metrics(st: SimState):
                fluid = st.fluid_mask
                speed = jnp.sqrt(jnp.sum(st.v * st.v, axis=-1))
                vmax = jnp.max(jnp.where(fluid, speed, 0.0))
                rho_err = jnp.where(
                    fluid,
                    jnp.abs(st.density - params.density0) / params.density0,
                    0.0,
                )
                nf = jnp.maximum(jnp.sum(fluid), 1)
                return {
                    "max_velocity": vmax,
                    "cfl": vmax * params.dt / params.support_length,
                    "avg_density_error": jnp.sum(rho_err) / nf,
                    "max_density_error": jnp.max(rho_err),
                    "num_active": jnp.sum(st.material != MATERIAL_INVALID),
                    "nan_count": jnp.sum(~jnp.isfinite(st.x))
                    + jnp.sum(~jnp.isfinite(st.v)),
                    "max_run_length": jnp.asarray(st.occ_window, jnp.int32),
                    "occ_halo": jnp.asarray(st.occ_halo, jnp.int32),
                    "seg_pad_occ": jnp.asarray(st.occ_rowpad, jnp.int32),
                    "migrate_anomalies": jnp.asarray(st.occ_resort, jnp.int32),
                    "shard_rows_used": jnp.asarray(st.occ_shard, jnp.int32),
                }

            self._metrics_jit = _metrics
        out = dict(self._metrics_jit(state))
        out["run_cap"] = jnp.asarray(self._occ_cap(), jnp.int32)
        out["shard_rows"] = jnp.asarray(self._shard_rows or 0, jnp.int32)
        out["seg_pad_cap"] = jnp.asarray(
            cfg.pad_capacity if cfg is not None else 0, jnp.int32
        )
        out["halo_buf_rows"] = jnp.asarray(
            sum(self._cap_h(a) or 0 for a in range(self.n_ax)), jnp.int32
        )
        return out


# the 2-axis (x × y) decomposition is the common case; the class accepts
# 2- or 3-axis meshes uniformly, so the historical name is an alias
ShardedWCSPH2D = ShardedWCSPHRect
