"""Equation of state for weakly-compressible SPH.

Reference: Tait EOS with density clamping at core/sph/wcsph.py:38-40 and
core/sph/wcsphv2.py:46-48 — rho <- max(rho, rho0), then
p = B ((rho/rho0)^gamma - 1).
"""

from __future__ import annotations

import jax.numpy as jnp


def tait_pressure(
    density: jnp.ndarray,
    density0: float,
    stiffness: float,
    exponent: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Clamp density to >= density0 and evaluate the Tait EOS.

    Returns (clamped_density, pressure).  The clamp suppresses tensile
    instability exactly as the reference does (wcsphv2.py:46).
    """
    rho = jnp.maximum(density, density0)
    ratio = rho / density0
    # exponent is 7 in the reference; integer powers lower to multiplies.
    if float(exponent) == int(exponent) and 1 <= int(exponent) <= 16:
        p = ratio ** int(exponent)
    else:
        p = ratio**exponent
    return rho, stiffness * (p - 1.0)
