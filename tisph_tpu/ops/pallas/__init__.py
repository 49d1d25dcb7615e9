"""Hand-written Pallas TPU kernels — the performance tier.

The jnp blocked sweep (ops/neighbors.py) always processes ``window_cap``
candidate lanes per block row; these kernels DMA the candidate window into
VMEM and loop only over ``ceil(actual_window / tile)`` tiles — work
proportional to the real neighborhood, plus explicit double-buffered
residency.
"""
