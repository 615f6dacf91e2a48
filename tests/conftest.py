"""Test harness config: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's test approach of exercising the full stack without
special hardware (MockProver + dev SRS, SURVEY.md §4): here we force the CPU
backend with 8 virtual devices so sharding paths are testable anywhere; the
real-TPU path is exercised by bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
