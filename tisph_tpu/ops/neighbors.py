"""Vectorised neighbor iteration over stencil runs.

TPU-native equivalent of the reference's ``for_all_neighbors`` task-callback
traversal (partice_systemv4.py:331-345): instead of a per-particle dynamic
loop over 3^dim cells, a ``lax.scan`` over the 3^(dim-1) stencil rows
gathers fixed-capacity masked windows of the cell-sorted particle array and
evaluates the pair callback on (N, run_cap) lanes at once.  The callback
(`pair_fn`) plays the role of the reference's ``@ti.func`` tasks
(e.g. compute_density_task, wcsphv2.py:18-25) but is vectorised and fused by
XLA into the surrounding sweep.
"""

from __future__ import annotations

from typing import Callable, Mapping

import jax
import jax.numpy as jnp

from tisph_tpu.ops.grid import GridSpec
from tisph_tpu.ops.kernels import cubic_kernel, cubic_kernel_grad

# pair_fn(j_fields, r_vec, r2, w, grad_w) -> pytree of per-pair contributions
# with leading shape (N, run_cap).
PairFn = Callable[..., object]


def neighbor_sweep(
    runs: jax.Array,
    x_sorted: jax.Array,
    gather_fields: Mapping[str, jax.Array],
    pair_fn: PairFn,
    init_acc,
    spec: GridSpec,
    support_length: float,
):
    """Accumulate pair contributions over all neighbors.

    Args:
      runs: (N, num_rows, 2) int32 stencil runs from :func:`stencil_runs`.
      x_sorted: (N, dim) positions in cell-sorted order.
      gather_fields: name -> (N, ...) arrays to gather for the j side.
      pair_fn: computes per-pair contributions; invalid lanes are masked
        centrally (so the callback need not handle padding or self-pairs,
        mirroring the reference criterion ``p_i != p_j and |r| < h`` at
        partice_systemv4.py:344).
      init_acc: pytree of (N, ...) accumulators (start values, e.g. W(0)
        self-terms or gravity).

    Returns the accumulated pytree.
    """
    n = x_sorted.shape[0]
    cap = spec.run_cap
    own = jnp.arange(n, dtype=jnp.int32)
    lane = jnp.arange(cap, dtype=jnp.int32)
    h = support_length
    runs_rows = jnp.moveaxis(runs, 1, 0)  # (num_rows, N, 2)

    def body(acc, run_row):
        starts = run_row[:, 0]
        ends = run_row[:, 1]
        idx = starts[:, None] + lane[None, :]  # (N, cap)
        valid = (idx < ends[:, None]) & (idx != own[:, None])
        safe = jnp.where(valid, idx, 0)

        x_j = jnp.take(x_sorted, safe, axis=0)  # (N, cap, dim)
        r_vec = x_sorted[:, None, :] - x_j
        r2 = jnp.sum(r_vec * r_vec, axis=-1)
        valid = valid & (r2 < h * h)

        j_fields = {k: jnp.take(a, safe, axis=0) for k, a in gather_fields.items()}
        r_norm = jnp.sqrt(r2)
        w = cubic_kernel(r_norm, h, spec.dim)
        grad_w = cubic_kernel_grad(r_vec, h, spec.dim)

        contrib = pair_fn(j_fields, r_vec, r2, w, grad_w)

        def reduce_leaf(acc_leaf, c_leaf):
            mask = valid.reshape(valid.shape + (1,) * (c_leaf.ndim - 2))
            return acc_leaf + jnp.sum(jnp.where(mask, c_leaf, 0.0), axis=1)

        return jax.tree.map(reduce_leaf, acc, contrib), None

    acc, _ = jax.lax.scan(body, init_acc, runs_rows)
    return acc
