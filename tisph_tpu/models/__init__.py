"""Solvers ("model families"): WCSPH (flagship, reference wcsphv2 physics)
and WCSPHLegacy (reference wcsph/sph_base v1 physics)."""

from tisph_tpu.models.state import SimState
from tisph_tpu.models.wcsph import WCSPH
from tisph_tpu.models.wcsph_legacy import WCSPHLegacy
