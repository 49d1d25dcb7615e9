"""Utilities: union-find clustering, domain wireframes, metrics, profiling."""

from tisph_tpu.utils.dsu import DSU, cluster_points
from tisph_tpu.utils.lines import domain_wireframe
