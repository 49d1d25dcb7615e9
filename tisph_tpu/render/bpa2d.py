"""2D ball-pivoting boundary extraction (surface reconstruction).

Counterpart of the reference's render/bpa/d2.py: cluster the point set with
union-find (DSU pre-grouping, d2.py:20-34), then per group walk the boundary
with a pivoting circle — start at the highest point with the circle directly
above, repeatedly advance to the unvisited point with the minimum clockwise
angle, updating the circle to sit on each new chord (d2.py:74-137).

The walk is inherently sequential per group, so it stays on the host
(SURVEY.md §3.4): the hot parts (grid-hashed clustering + the O(k n) walk)
run in the C++ native library when available, with a numpy fallback.
Output is boundary polylines + an optional triangle-fan fill, matching the
reference's ``gui.triangles`` rendering (d2.py:165-176).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from tisph_tpu.utils.dsu import cluster_points


@dataclasses.dataclass
class Boundary2D:
    points: np.ndarray            # (n, 2) input points
    loops: list[np.ndarray]       # per group: boundary vertex indices, in walk order
    edges: np.ndarray             # (m, 2) concatenated boundary edges

    def triangle_fans(self) -> list[np.ndarray]:
        """Per loop: (k-2, 3) triangle-fan indices for filled rendering."""
        fans = []
        for loop in self.loops:
            if len(loop) < 3:
                continue
            base = loop[0]
            fans.append(
                np.stack(
                    [np.full(len(loop) - 2, base), loop[1:-1], loop[2:]], axis=1
                )
            )
        return fans


def _trace_group_numpy(pts: np.ndarray, members: np.ndarray, radius: float) -> np.ndarray:
    """Pure-numpy ball-pivot walk (reference d2.py:74-137 semantics)."""
    visited = np.zeros(pts.shape[0], dtype=bool)
    cur = members[np.argmax(pts[members, 1])]
    circle = pts[cur] + np.array([0.0, radius])
    order = [int(cur)]
    visited[cur] = True
    while True:
        p = pts[cur]
        base = circle - p
        cand = members[~visited[members]]
        if cand.size == 0:
            break
        t = pts[cand] - p
        dot = base[0] * t[:, 0] + base[1] * t[:, 1]
        cross = base[0] * t[:, 1] - base[1] * t[:, 0]
        ang = -np.degrees(np.arctan2(cross, dot))
        ang = np.where(ang < 0, ang + 360.0, ang)
        nxt = int(cand[np.argmin(ang)])
        e = pts[nxt]
        mid = (p + e) / 2.0
        chord2 = float(((e - p) ** 2).sum())
        h = np.sqrt(max(radius * radius - chord2 / 4.0, 0.0))
        d = e - p
        ln = np.sqrt(chord2)
        if ln > 0:
            d = d / ln
        circle = np.array([mid[0] - d[1] * h, mid[1] + d[0] * h])
        visited[nxt] = True
        order.append(nxt)
        cur = nxt
    return np.asarray(order, dtype=np.int64)


def extract_boundary_2d(
    points: np.ndarray, radius: float, use_native: bool = True
) -> Boundary2D:
    """Cluster + per-group ball-pivot boundary walk."""
    pts = np.asarray(points, dtype=np.float64)
    groups = cluster_points(pts, radius, use_native=use_native)

    lib = None
    if use_native:
        try:
            from tisph_tpu.native import loader

            lib = loader.load()
        except Exception:
            lib = None

    loops: list[np.ndarray] = []
    edge_list = []
    for g in groups:
        members = np.asarray(g, dtype=np.int64)
        if members.size == 1:
            loops.append(members)
            continue
        if lib is not None:
            from tisph_tpu.native import loader

            order = loader.bpa_trace_2d(lib, pts, members, radius)
        else:
            order = _trace_group_numpy(pts, members, radius)
        loops.append(order)
        if len(order) >= 2:
            edge_list.append(np.stack([order[:-1], order[1:]], axis=1))
    edges = (
        np.concatenate(edge_list, axis=0)
        if edge_list
        else np.zeros((0, 2), dtype=np.int64)
    )
    return Boundary2D(points=pts, loops=loops, edges=edges)
