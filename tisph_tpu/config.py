"""Scene and solver configuration.

The JSON scene schema is the reference's de-facto public API surface
(reference: data/scenes/demo_2d.json, demo_3d.json, consumed at
core/partice_system/partice_systemv4.py:10-22 and core/sph/sph_basev2.py:16,
core/sph/wcsphv2.py:16).  This module parses the identical schema so existing
scene files run unchanged, and — unlike the reference, which parses but
ignores most physics keys (SURVEY.md §2.2) — optionally honors every key.

Two physics-parameter presets exist:

- ``compat="reference"`` (default): use the constants the reference hardcodes
  (stiffness=50 at wcsphv2.py:10-11, dt=2e-4 at sph_basev2.py:15,
  viscosity=0.05 at sph_basev2.py:12, surface tension 0.01 at wcsphv2.py:64,
  boundary sigma 0.08 at wcsphv2.py:75, collision factor 0.5 at
  sph_basev2.py:95), so trajectories are comparable to the reference.
- ``compat="config"``: honor the scene's own ``B``/``gamma``/``dt``/
  ``viscosity``/``surfaceTension``/``collisionFactor`` keys.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Sequence

import numpy as np

_DEFAULT_DENSITY0 = 1000.0


@dataclasses.dataclass(frozen=True)
class FluidBlock:
    """Axis-aligned lattice-sampled fluid block.

    Reference: the ``fluidBlocks`` entries consumed at
    partice_systemv4.py:134-146 (start/end/velocity/density/color; the
    reference also parses translation/scale but never applies them — we do).
    """

    start: tuple[float, ...]
    end: tuple[float, ...]
    velocity: tuple[float, ...]
    density: float = _DEFAULT_DENSITY0
    color: tuple[float, float, float] = (0.2, 0.4, 0.8)
    translation: tuple[float, ...] | None = None
    scale: tuple[float, ...] | None = None
    object_id: int = 0
    # lattice spacing; None = particle radius (the reference's convention,
    # ~8x oversampled -> rest density ~ 4-8 rho0 with a violent settling
    # transient).  Set to the particle DIAMETER for standard SPH sampling
    # (calm pools at rest density).  JSON key: "spacing" (float) or
    # "spacing": "diameter".
    spacing: float | None = None


@dataclasses.dataclass(frozen=True)
class BoundaryBlock:
    """Lattice-sampled static boundary box (walls / obstacles).

    Build-side extension: the reference's only 2D boundary source is the
    commented-out rigid path (partice_systemv2.py:92-121); this gives 2D
    and 3D scenes axis-aligned boundary-particle obstacles without a mesh.
    Sampled at the particle diameter (like voxelized rigid bodies).
    """

    start: tuple[float, ...]
    end: tuple[float, ...]
    density: float = _DEFAULT_DENSITY0
    color: tuple[float, float, float] = (0.6, 0.6, 0.6)


@dataclasses.dataclass(frozen=True)
class RigidBody:
    """Voxelized static rigid / boundary body loaded from a mesh file.

    Reference: ``rigidBodies`` entries consumed at
    partice_systemv4.py:104-131 and voxelized at :259-277.
    """

    geometry_file: str
    scale: tuple[float, ...]
    translation: tuple[float, ...]
    rotation_angle: float = 0.0
    rotation_axis: tuple[float, float, float] = (0.0, 1.0, 0.0)
    velocity: tuple[float, ...] = (0.0, 0.0, 0.0)
    density: float = _DEFAULT_DENSITY0
    color: tuple[float, float, float] = (0.6, 0.6, 0.6)
    is_dynamic: bool = False  # reference bodies are always static


@dataclasses.dataclass(frozen=True)
class Emitter:
    """Inflow emitter (build-side extension; the reference has none —
    SURVEY.md §2.3.10, BASELINE config 4).

    Emits a ``shape``-sized plane/box of lattice-sampled fluid particles with
    the given velocity every ``interval`` solver steps, drawing from the
    pre-allocated inactive particle pool.
    """

    start: tuple[float, ...]
    end: tuple[float, ...]
    velocity: tuple[float, ...]
    interval: int = 50
    density: float = _DEFAULT_DENSITY0
    color: tuple[float, float, float] = (0.2, 0.4, 0.8)
    max_particles: int = 0  # 0 => until pool exhausted


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    """Parsed scene: domain + discretisation + bodies.

    Mirrors the reference ``configuration`` block
    (partice_systemv4.py:10-35): support length = 4 * particle radius
    (:34), padding = support length (:35), particle volume
    V0 = 0.8 * diameter**dim (:49).
    """

    dim: int
    domain_start: tuple[float, ...]
    domain_end: tuple[float, ...]
    particle_radius: float
    density0: float = _DEFAULT_DENSITY0
    gravitation: tuple[float, ...] = (0.0, -9.81, 0.0)
    c_s: float = 100.0
    fluid_blocks: tuple[FluidBlock, ...] = ()
    rigid_bodies: tuple[RigidBody, ...] = ()
    boundary_blocks: tuple[BoundaryBlock, ...] = ()
    emitters: tuple[Emitter, ...] = ()
    # Keys the reference parses but ignores (SURVEY.md §2.2) — retained and
    # honored under compat="config".
    stiffness_B: float | None = None
    gamma: float | None = None
    dt: float | None = None
    viscosity: float | None = None
    surface_tension: float | None = None
    collision_factor: float | None = None
    steps_per_render: int = 1
    simulation_method: int = 0
    output_interval: int = 40
    # Path the scene file was loaded from; relative geometryFile paths
    # resolve against its directory.
    base_dir: str = "."

    @property
    def support_length(self) -> float:
        return 4.0 * self.particle_radius

    @property
    def particle_diameter(self) -> float:
        return 2.0 * self.particle_radius

    @property
    def padding(self) -> float:
        return self.support_length

    @property
    def particle_volume0(self) -> float:
        return 0.8 * self.particle_diameter**self.dim

    @property
    def domain_size(self) -> tuple[float, ...]:
        return tuple(e - s for s, e in zip(self.domain_start, self.domain_end))


@dataclasses.dataclass(frozen=True)
class SolverParams:
    """Resolved physics parameters fed to the jitted step function.

    All fields are static Python floats (hashable) so a solver recompiles
    only when physics genuinely changes.
    """

    dim: int
    dt: float = 2e-4
    density0: float = _DEFAULT_DENSITY0
    stiffness: float = 50.0
    exponent: float = 7.0
    viscosity: float = 0.05
    surface_tension: float = 0.01
    boundary_sigma: float = 0.08
    collision_factor: float = 0.5
    c_s: float = 100.0
    # compat="reference-exact": reproduce the reference's *bugs* bit-for-bit
    # instead of the intended equations (see WCSPH/WCSPHLegacy docstrings);
    # used to measure intended-vs-shipped divergence, not for production.
    reference_exact: bool = False
    gravity: tuple[float, ...] = (0.0, -9.81, 0.0)
    support_length: float = 0.04
    particle_radius: float = 0.01
    padding: float = 0.04
    domain_start: tuple[float, ...] = (0.0, 0.0, 0.0)
    domain_end: tuple[float, ...] = (1.0, 1.0, 1.0)

    @classmethod
    def from_scene(cls, scene: SceneConfig, compat: str = "reference") -> "SolverParams":
        """Resolve physics parameters from a scene.

        ``compat="reference"`` reproduces the constants hardcoded by the
        reference solvers; ``compat="config"`` honors the scene's declared
        (but reference-ignored) keys, falling back to the same defaults.
        """
        if compat not in ("reference", "config", "reference-exact"):
            raise ValueError(f"unknown compat preset: {compat!r}")
        use_cfg = compat == "config"

        def pick(cfg_val, ref_val):
            return ref_val if (not use_cfg or cfg_val is None) else cfg_val

        return cls(
            dim=scene.dim,
            dt=pick(scene.dt, 2e-4),
            density0=scene.density0,
            stiffness=pick(scene.stiffness_B, 50.0),
            exponent=pick(scene.gamma, 7.0),
            viscosity=pick(scene.viscosity, 0.05),
            surface_tension=pick(scene.surface_tension, 0.01),
            boundary_sigma=0.08,
            reference_exact=compat == "reference-exact",
            collision_factor=pick(scene.collision_factor, 0.5),
            c_s=scene.c_s,
            gravity=tuple(scene.gravitation[: scene.dim]),
            support_length=scene.support_length,
            particle_radius=scene.particle_radius,
            padding=scene.padding,
            domain_start=scene.domain_start,
            domain_end=scene.domain_end,
        )


def _tup(v: Sequence[float] | None, dim: int, default: float = 0.0) -> tuple[float, ...]:
    if v is None:
        return (default,) * dim
    return tuple(float(x) for x in v)


def _color(v: Any) -> tuple[float, float, float]:
    if v is None:
        return (0.2, 0.4, 0.8)
    arr = np.asarray(v, dtype=np.float64).reshape(-1)[:3]
    # The reference accepts 0-255 ints and normalises (partice_systemv4.py:113-116).
    if arr.max(initial=0.0) > 1.0:
        arr = arr / 255.0
    return tuple(float(x) for x in arr)


def scene_from_dict(raw: dict[str, Any], base_dir: str = ".") -> SceneConfig:
    """Build a :class:`SceneConfig` from the reference JSON schema dict."""
    cfg = raw.get("configuration", {})
    # dim defaults to the length of domainStart when absent (demo_2d.json has
    # no "dim" key — the reference's 2D path just hardcodes dim=2).
    dom_start = cfg.get("domainStart", [0.0, 0.0, 0.0])
    dim = int(cfg.get("dim", len(dom_start)))
    # demo_2d.json declares a 3-vector domain for a 2D sim; truncate.
    dom_start = _tup(dom_start[:dim], dim)
    dom_end = _tup(cfg.get("domainEnd", [1.0] * dim)[:dim], dim)

    pr = float(cfg.get("particleRadius", 0.01))
    fluid_blocks = []
    for fb in raw.get("fluidBlocks", []) or []:
        d = min(dim, len(fb["start"]))
        sp = fb.get("spacing")
        if sp == "diameter":
            sp = 2.0 * pr
        fluid_blocks.append(
            FluidBlock(
                start=_tup(fb["start"][:d], d),
                end=_tup(fb["end"][:d], d),
                velocity=_tup(fb.get("velocity"), d),
                density=float(fb.get("density", _DEFAULT_DENSITY0) or _DEFAULT_DENSITY0),
                color=_color(fb.get("color")),
                translation=_tup(fb["translation"][:d], d) if fb.get("translation") else None,
                scale=_tup(fb["scale"][:d], d) if fb.get("scale") else None,
                object_id=int(fb.get("objectId", 0)),
                spacing=float(sp) if sp is not None else None,
            )
        )

    rigid_bodies = []
    for rb in raw.get("rigidBodies", []) or []:
        rigid_bodies.append(
            RigidBody(
                geometry_file=str(rb["geometryFile"]),
                scale=_tup(rb.get("scale", [1.0] * dim), dim, 1.0),
                translation=_tup(rb.get("translation"), dim),
                rotation_angle=float(rb.get("rotationAngle", 0.0)),
                rotation_axis=tuple(float(x) for x in rb.get("rotationAxis", [0.0, 1.0, 0.0])),
                velocity=_tup(rb.get("velocity"), dim),
                density=float(rb.get("density", _DEFAULT_DENSITY0) or _DEFAULT_DENSITY0),
                color=_color(rb.get("color")),
                is_dynamic=bool(rb.get("isDynamic", False)),
            )
        )

    boundary_blocks = []
    for bb in raw.get("boundaryBlocks", []) or []:
        d = min(dim, len(bb["start"]))
        boundary_blocks.append(
            BoundaryBlock(
                start=_tup(bb["start"][:d], d),
                end=_tup(bb["end"][:d], d),
                density=float(bb.get("density", _DEFAULT_DENSITY0)),
                color=_color(bb.get("color")),
            )
        )

    emitters = []
    for em in raw.get("emitters", []) or []:
        d = min(dim, len(em["start"]))
        emitters.append(
            Emitter(
                start=_tup(em["start"][:d], d),
                end=_tup(em["end"][:d], d),
                velocity=_tup(em.get("velocity"), d),
                interval=int(em.get("interval", 50)),
                density=float(em.get("density", _DEFAULT_DENSITY0)),
                color=_color(em.get("color")),
                max_particles=int(em.get("maxParticles", 0)),
            )
        )

    grav = cfg.get("gravitation")
    if grav is None:
        grav = [0.0, -9.81, 0.0]
    return SceneConfig(
        dim=dim,
        domain_start=dom_start,
        domain_end=dom_end,
        particle_radius=float(cfg.get("particleRadius", 0.01)),
        density0=float(cfg.get("density0", _DEFAULT_DENSITY0)),
        gravitation=tuple(float(g) for g in grav),
        c_s=float(cfg.get("c_s", 100.0)),
        fluid_blocks=tuple(fluid_blocks),
        rigid_bodies=tuple(rigid_bodies),
        boundary_blocks=tuple(boundary_blocks),
        emitters=tuple(emitters),
        stiffness_B=float(cfg["B"]) if "B" in cfg else None,
        gamma=float(cfg["gamma"]) if "gamma" in cfg else None,
        dt=float(cfg["dt"]) if "dt" in cfg else None,
        viscosity=float(cfg["viscosity"]) if "viscosity" in cfg else None,
        surface_tension=float(cfg["surfaceTension"]) if "surfaceTension" in cfg else None,
        collision_factor=float(cfg["collisionFactor"]) if "collisionFactor" in cfg else None,
        steps_per_render=int(cfg.get("numberOfStepsPerRenderUpdate", 1)),
        simulation_method=int(cfg.get("simulationMethod", 0)),
        output_interval=int(cfg.get("outputInterval", 40)),
        base_dir=base_dir,
    )


def load_scene(path: str | os.PathLike) -> SceneConfig:
    """Load a scene JSON file in the reference schema."""
    path = os.fspath(path)
    with open(path) as f:
        raw = json.load(f)
    return scene_from_dict(raw, base_dir=os.path.dirname(os.path.abspath(path)))
