"""Brute-force NumPy oracle of the intended reference physics.

An independent O(n^2) implementation of the V2 WCSPH equations
(sph_basev2.py + wcsphv2.py, intended form per SURVEY.md §7.3) used to gate
the framework's sorted/CSR/stencil-run device path trajectory-by-trajectory.
Everything here is float64 numpy with explicit loops over all pairs — no
grids, no sorting, no JAX — so a bug in the device neighbor structure cannot
hide in the oracle.
"""

from __future__ import annotations

import numpy as np

MATERIAL_BOUNDARY = 0
MATERIAL_FLUID = 1


def cubic_w(r_norm: np.ndarray, h: float, dim: int) -> np.ndarray:
    if dim == 1:
        k = 4.0 / 3.0
    elif dim == 2:
        k = 40.0 / (7.0 * np.pi)
    else:
        k = 8.0 / np.pi
    k = k / h**dim
    q = r_norm / h
    res = np.zeros_like(q)
    m1 = q <= 0.5
    m2 = (q > 0.5) & (q <= 1.0)
    res = np.where(m1, k * (6.0 * (q**3 - q**2) + 1.0), res)
    res = np.where(m2, k * 2.0 * (1.0 - q) ** 3, res)
    return res


def cubic_gw(r_vec: np.ndarray, h: float, dim: int) -> np.ndarray:
    if dim == 1:
        k = 4.0 / 3.0
    elif dim == 2:
        k = 40.0 / 7.0 / np.pi
    else:
        k = 8.0 / np.pi
    k = 6.0 * k / h**dim
    r_norm = np.linalg.norm(r_vec, axis=-1)
    q = r_norm / h
    out = np.zeros_like(r_vec)
    valid = (r_norm > 1e-5) & (q <= 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        grad_q = r_vec / (r_norm * h)[..., None]
    mag = np.where(q <= 0.5, k * q * (3.0 * q - 2.0), -k * (1.0 - q) ** 2)
    out = np.where(valid[..., None], mag[..., None] * grad_q, 0.0)
    return out


class OracleWCSPHV1:
    """Intended V1 physics (sph_base.py + wcsph.py, bug-corrected — see
    models/wcsph_legacy.py docstring): unit-volume density, Laplacian-style
    viscosity over all neighbors, scalar gravity on the last axis,
    per-axis boundary reflection."""

    def __init__(self, dim, domain_start, domain_end, particle_radius,
                 density0=1000.0, dt=2e-4, stiffness=50.0, exponent=7.0,
                 viscosity=0.05, collision_factor=0.5):
        self.dim = dim
        self.domain_start = np.asarray(domain_start, dtype=np.float64)
        self.domain_end = np.asarray(domain_end, dtype=np.float64)
        self.h = 4.0 * particle_radius
        self.padding = self.h
        self.m_v = 0.8 * (2.0 * particle_radius) ** dim
        self.mass = self.m_v * density0
        self.density0 = density0
        self.dt = dt
        self.stiffness = stiffness
        self.exponent = exponent
        self.viscosity = viscosity
        self.collision_factor = collision_factor

    def step(self, x, v, density, pressure, volume, material):
        x = x.astype(np.float64).copy()
        v = v.astype(np.float64).copy()
        density = density.astype(np.float64).copy()
        volume = volume.astype(np.float64).copy()
        fluid = material == MATERIAL_FLUID
        bound = material == MATERIAL_BOUNDARY
        n = x.shape[0]

        r = x[:, None, :] - x[None, :, :]
        d = np.linalg.norm(r, axis=-1)
        mask = (d < self.h) & ~np.eye(n, dtype=bool)
        w = cubic_w(d, self.h, self.dim) * mask
        gw = cubic_gw(r, self.h, self.dim) * mask[..., None]

        # Akinci boundary volume (shared with V2)
        w0 = cubic_w(np.zeros(1), self.h, self.dim)[0]
        delta = w0 + (w * bound[None, :]).sum(axis=1)
        volume = np.where(bound, 1.0 / np.maximum(delta, 1e-10), volume)

        # density: rho0 * sum_{j fluid} m_V W (no self term; wcsph.py:18-32)
        rho_new = self.density0 * (w * fluid[None, :] * self.m_v).sum(axis=1)
        density = np.where(fluid, rho_new, density)
        density = np.maximum(density, self.density0)
        pressure = self.stiffness * ((density / self.density0) ** self.exponent - 1.0)

        dv = np.zeros_like(x)
        dv[:, self.dim - 1] = -9.80  # const.py:2
        v_ij = v[:, None, :] - v[None, :, :]
        dot = (v_ij * r).sum(axis=-1)
        # viscosity over ALL neighbors (sph_base.py:77-84)
        coef = (2.0 * (self.dim + 2) * self.viscosity
                * (self.mass / density[None, :]) * dot / (d**2 + 0.01 * self.h**2))
        p_rho2 = pressure / density**2
        coef = coef - fluid[None, :] * (self.density0 * self.m_v) * (
            p_rho2[:, None] + p_rho2[None, :]
        )
        coef = coef - bound[None, :] * (self.density0 * volume[None, :]) * p_rho2[:, None]
        dv += (np.where(mask, coef, 0.0)[..., None] * gw).sum(axis=1)
        dv = np.where(fluid[:, None], dv, 0.0)

        v = np.where(fluid[:, None], v + self.dt * dv, v)
        x = np.where(fluid[:, None], x + self.dt * v, x)

        lo = self.domain_start + self.padding
        hi = self.domain_end - self.padding
        out = (x < lo) | (x > hi)
        x = np.where(fluid[:, None], np.clip(x, lo, hi), x)
        v = np.where(fluid[:, None] & out,
                     v - (1.0 + self.collision_factor) * v, v)
        return x, v, density, pressure, volume


class OracleWCSPH:
    """Reference-equation simulator over plain arrays (intended V2 physics)."""

    def __init__(
        self,
        dim: int,
        domain_start,
        domain_end,
        particle_radius: float,
        density0: float = 1000.0,
        gravity=None,
        c_s: float = 88.5,
        dt: float = 2e-4,
        stiffness: float = 50.0,
        exponent: float = 7.0,
        viscosity: float = 0.05,
        surface_tension: float = 0.01,
        boundary_sigma: float = 0.08,
        collision_factor: float = 0.5,
    ):
        self.dim = dim
        self.domain_start = np.asarray(domain_start, dtype=np.float64)
        self.domain_end = np.asarray(domain_end, dtype=np.float64)
        self.h = 4.0 * particle_radius
        self.padding = self.h
        self.v0 = 0.8 * (2.0 * particle_radius) ** dim
        self.density0 = density0
        self.gravity = (
            np.asarray(gravity, dtype=np.float64)
            if gravity is not None
            else np.concatenate([[0.0], [-9.81], [0.0]])[:dim]
        )
        self.c_s = c_s
        self.dt = dt
        self.stiffness = stiffness
        self.exponent = exponent
        self.viscosity = viscosity
        self.surface_tension = surface_tension
        self.boundary_sigma = boundary_sigma
        self.collision_factor = collision_factor

    def _pairs(self, x: np.ndarray):
        """All-pairs displacement r_ij = x_i - x_j and neighbor mask."""
        r = x[:, None, :] - x[None, :, :]
        d = np.linalg.norm(r, axis=-1)
        n = x.shape[0]
        mask = (d < self.h) & ~np.eye(n, dtype=bool)
        return r, d, mask

    def step(self, x, v, density, pressure, mass, volume, material):
        x = x.astype(np.float64).copy()
        v = v.astype(np.float64).copy()
        density = density.astype(np.float64).copy()
        mass = mass.astype(np.float64).copy()
        volume = volume.astype(np.float64).copy()
        fluid = material == MATERIAL_FLUID
        bound = material == MATERIAL_BOUNDARY

        r, d, mask = self._pairs(x)
        w = cubic_w(d, self.h, self.dim) * mask
        gw = cubic_gw(r, self.h, self.dim) * mask[..., None]

        # Akinci boundary volume (sph_basev2.py:190-201)
        w0 = cubic_w(np.zeros(1), self.h, self.dim)[0]
        delta = w0 + (w * bound[None, :]).sum(axis=1)
        volume = np.where(bound, 1.0 / np.maximum(delta, 1e-10), volume)

        # density summation (intended wcsphv2 form)
        eff = np.where(fluid, mass, 0.0) + np.where(bound, self.density0 * volume, 0.0)
        rho_new = mass * w0 + (w * eff[None, :]).sum(axis=1)
        density = np.where(fluid, rho_new, density)

        # Tait EOS (wcsphv2.py:44-48)
        density = np.maximum(density, self.density0)
        pressure = self.stiffness * ((density / self.density0) ** self.exponent - 1.0)

        # forces
        dv = np.tile(self.gravity, (x.shape[0], 1)).astype(np.float64)
        v_ij = v[:, None, :] - v[None, :, :]
        dot = (v_ij * r).sum(axis=-1)
        denom = d**2 + 0.01 * self.h**2
        dot_neg = np.minimum(dot, 0.0) / denom

        m_j = mass[None, :]
        rho_i = density[:, None]
        rho_j = density[None, :]
        fl_j = fluid[None, :].astype(np.float64)
        bd_j = bound[None, :].astype(np.float64)
        bvol_j = self.density0 * volume[None, :]

        # cohesion (wcsphv2.py:61-65)
        coh = -(self.surface_tension / mass[:, None]) * (fl_j * m_j * w)
        dv += (coh[..., None] * r).sum(axis=1)

        # artificial viscosity fluid-j (wcsphv2.py:68-73)
        nu_f = 2.0 * self.viscosity * self.h * self.c_s / (rho_i + rho_j)
        gcoef = fl_j * m_j * nu_f * dot_neg
        # boundary viscosity (wcsphv2.py:74-80)
        nu_b = self.boundary_sigma * self.h * self.c_s / (2.0 * rho_i)
        gcoef += bd_j * bvol_j * nu_b * dot_neg
        # pressure (sph_basev2.py:64-78)
        p_rho2 = pressure / density**2
        gcoef -= fl_j * m_j * (p_rho2[:, None] + p_rho2[None, :])
        gcoef -= bd_j * bvol_j * p_rho2[:, None]
        dv += (gcoef[..., None] * gw).sum(axis=1)

        dv = np.where(fluid[:, None], dv, 0.0)

        # symplectic Euler (wcsphv2.py:95-100)
        v = np.where(fluid[:, None], v + self.dt * dv, v)
        x = np.where(fluid[:, None], x + self.dt * v, x)

        # boundary clamp (sph_basev2.py:158-189, combined normal)
        lo = self.domain_start + self.padding
        hi = self.domain_end - self.padding
        normal = np.where(x > hi, 1.0, 0.0) + np.where(x <= lo, -1.0, 0.0)
        x_cl = np.clip(x, lo, hi)
        x = np.where(fluid[:, None], x_cl, x)
        n_len = np.linalg.norm(normal, axis=-1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            n_hat = np.where(n_len > 1e-6, normal / np.maximum(n_len, 1e-12), 0.0)
        vdn = (v * n_hat).sum(axis=-1, keepdims=True)
        v_ref = v - (1.0 + self.collision_factor) * vdn * n_hat
        v = np.where(fluid[:, None] & (n_len > 1e-6), v_ref, v)

        return x, v, density, pressure, mass, volume
