"""tisph_tpu — a TPU-native smoothed-particle-hydrodynamics (SPH) framework.

A ground-up rebuild of the capabilities of the Ti-SPH reference (a Taichi
WCSPH fluid simulator) designed for TPU hardware: JAX/XLA for the compute
graph, sort-based cell binning instead of atomic scatters, Pallas kernels for
the fused neighbor sweeps, and ``shard_map`` spatial domain decomposition for
multi-chip scaling.

Layer map (mirrors reference layers reconstructed in SURVEY.md §1):

- ``tisph_tpu.config``    — scene/config schema (reference: data/scenes/*.json)
- ``tisph_tpu.geometry``  — samplers, mesh load + voxelize (reference: trimesh path)
- ``tisph_tpu.ops``       — grid/neighbor/force device ops (reference: @ti.kernel tier)
- ``tisph_tpu.models``    — solvers: WCSPH et al (reference: core/sph/)
- ``tisph_tpu.parallel``  — multi-chip domain decomposition (new capability)
- ``tisph_tpu.render``    — frame export, viewers, BPA surface reconstruction
- ``tisph_tpu.utils``     — metrics, profiling, wireframes, DSU
"""

from tisph_tpu.version import __version__
from tisph_tpu.config import SceneConfig, SolverParams, load_scene, scene_from_dict
from tisph_tpu.models.state import SimState, MATERIAL_BOUNDARY, MATERIAL_FLUID, MATERIAL_INVALID
from tisph_tpu.models.wcsph import WCSPH
from tisph_tpu.models.wcsph_legacy import WCSPHLegacy
from tisph_tpu.models.wcsph_rigid import WCSPHRigid
from tisph_tpu.geometry.builder import build_state

__all__ = [
    "__version__",
    "SceneConfig",
    "SolverParams",
    "load_scene",
    "scene_from_dict",
    "SimState",
    "MATERIAL_BOUNDARY",
    "MATERIAL_FLUID",
    "MATERIAL_INVALID",
    "WCSPH",
    "WCSPHLegacy",
    "WCSPHRigid",
    "build_state",
]
