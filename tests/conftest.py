"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding logic is tested on a virtual 8-device CPU mesh
(SURVEY.md section 4, item e); the real TPU is exercised by bench.py.
This must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
