"""Device-side compute ops: smoothing kernels, EOS, grid binning, neighbor
sweeps.  This tier replaces the reference's ``@ti.kernel`` native tier
(SURVEY.md §2.9) with jit-fused XLA and Pallas TPU kernels."""

from tisph_tpu.ops.kernels import cubic_kernel, cubic_kernel_grad, cubic_kernel_sigma
from tisph_tpu.ops.eos import tait_pressure
