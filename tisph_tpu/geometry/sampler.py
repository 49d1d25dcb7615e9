"""Lattice samplers for fluid blocks.

Reference ``add_cube`` (partice_systemv4.py:347-373): per-axis
``np.arange(start, end, particle_radius)`` then an ij-meshgrid — particles at
*radius* spacing (2x oversampled versus diameter spacing; this is the
reference's convention and sets its neighbor density, SURVEY.md §6).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def cube_lattice(
    start: Sequence[float],
    end: Sequence[float],
    spacing: float,
    translation: Sequence[float] | None = None,
    scale: Sequence[float] | None = None,
) -> np.ndarray:
    """Axis-aligned lattice of points in [start, end) with ``spacing``.

    Matches the reference's arange semantics exactly (endpoint-exclusive).
    ``scale``/``translation`` are applied about the block origin — an
    extension; the reference parses but ignores them (SURVEY.md §2.2).
    """
    start = np.asarray(start, dtype=np.float64)
    end = np.asarray(end, dtype=np.float64)
    if scale is not None:
        end = start + (end - start) * np.asarray(scale, dtype=np.float64)
    axes = [np.arange(s, e, spacing) for s, e in zip(start, end)]
    grid = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([g.ravel() for g in grid], axis=-1).astype(np.float32)
    if translation is not None:
        pts = pts + np.asarray(translation, dtype=np.float32)
    return pts


def count_cube_particles(start: Sequence[float], end: Sequence[float], spacing: float) -> int:
    """Exact lattice count (reference compute_cube_particles_num,
    partice_systemv4.py:160-168)."""
    return int(np.prod([len(np.arange(s, e, spacing)) for s, e in zip(start, end)]))
