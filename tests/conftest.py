"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding logic is tested on a virtual 8-device CPU mesh
(SURVEY.md section 4, item e); the real TPU is exercised by bench.py.

Note: this environment's axon sitecustomize calls
`jax.config.update("jax_platforms", "axon,cpu")` at interpreter startup,
which overrides the JAX_PLATFORMS env var -- so we must override the
*config* after importing jax, and set XLA_FLAGS before the CPU backend
is first initialized.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
