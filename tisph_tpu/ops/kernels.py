"""SPH smoothing kernels (cubic spline), branch-free and batched.

Physics parity: reference cubic-spline kernel and gradient at
core/sph/sph_base.py:18-60 (identical copy at sph_basev2.py:19-61) — the
dim-dependent normalisation k ∈ {4/3, 40/7π, 8/π} / h^dim and the piecewise
q ≤ 0.5 / q ≤ 1 polynomial.  The reference evaluates these per-pair inside a
Taichi device func with scalar branches; here they are vectorised,
branch-free (``jnp.where`` selects, which XLA fuses into the surrounding
sweep) and shape-polymorphic so the same code runs in jnp sweeps and inside
Pallas kernel bodies.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def cubic_kernel_sigma(dim: int, h: float) -> float:
    """Normalisation factor k / h**dim for the cubic spline."""
    if dim == 1:
        k = 4.0 / 3.0
    elif dim == 2:
        k = 40.0 / (7.0 * np.pi)
    elif dim == 3:
        k = 8.0 / np.pi
    else:
        raise ValueError(f"unsupported dim={dim}")
    return k / h**dim


def cubic_kernel(r_norm: jnp.ndarray, h: float, dim: int) -> jnp.ndarray:
    """W(r) — cubic spline value for pair distance(s) ``r_norm``.

    Piecewise (reference sph_base.py:29-36):
        q <= 0.5 : k * (6 (q^3 - q^2) + 1)
        q <= 1   : k * 2 (1 - q)^3
        else     : 0
    """
    k = cubic_kernel_sigma(dim, h)
    q = r_norm / h
    inner = 6.0 * (q * q * q - q * q) + 1.0
    outer_b = 1.0 - q
    outer = 2.0 * outer_b * outer_b * outer_b
    w = jnp.where(q <= 0.5, inner, outer)
    return jnp.where(q <= 1.0, k * w, 0.0)


def cubic_kernel_grad(r_vec: jnp.ndarray, h: float, dim: int, eps: float = 1e-5) -> jnp.ndarray:
    """∇W(r) — gradient w.r.t. x_i for pair displacement(s) r = x_i - x_j.

    Reference sph_base.py:38-60:
        k' = 6 k;  grad_q = r / (|r| h)
        q <= 0.5 : k' q (3q - 2) grad_q
        q <= 1   : -k' (1 - q)^2 grad_q
    Zero when |r| <= eps or q > 1 (branch-free select here).

    ``r_vec`` has shape (..., dim); returns the same shape.
    """
    k6 = 6.0 * cubic_kernel_sigma(dim, h)
    r2 = jnp.sum(r_vec * r_vec, axis=-1, keepdims=True)
    r_norm = jnp.sqrt(r2)
    q = r_norm / h
    # Safe reciprocal: the q>1 / r~0 lanes are masked out below.
    inv = 1.0 / jnp.maximum(r_norm * h, eps * h)
    grad_q = r_vec * inv
    inner = k6 * q * (3.0 * q - 2.0)
    fac = 1.0 - q
    outer = -k6 * fac * fac
    mag = jnp.where(q <= 0.5, inner, outer)
    valid = (r_norm > eps) & (q <= 1.0)
    return jnp.where(valid, mag * grad_q, 0.0)
