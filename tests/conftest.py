"""Test configuration: force CPU with 8 virtual devices so the multi-chip
sharding paths are testable without a TPU pod (SURVEY.md §4e).

The harness preloads jax via sitecustomize with JAX_PLATFORMS=axon (TPU
tunnel), so env vars are too late here — use jax.config directly.  Set
TISPH_TEST_TPU=1 to run the suite on the real TPU instead.
"""

import os

import jax

if not os.environ.get("TISPH_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
