"""Test harness config: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's test approach of exercising the full stack without
special hardware (MockProver + dev SRS, SURVEY.md §4): here we force the CPU
backend with 8 virtual devices so sharding paths are testable anywhere; the
real-TPU path is exercised by bench.py.
"""

import os

# The image presets JAX_PLATFORMS=axon (the TPU tunnel) and a sitecustomize
# registers the plugin in every process, so the env var alone is not enough:
# jax.config must be updated after import, before first backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's collective rendezvous TERMINATES the process (SIGABRT) when a
# participant is late past its default timeout. With 8 virtual devices
# timesliced onto few physical cores, any concurrent machine load can stall
# one participant long enough to trip it — observed as flaky full-suite
# aborts inside mesh/shard_map tests. Raise both timeouts far beyond any
# plausible scheduler stall.
if "xla_cpu_collective_timeout" not in _flags:
    _flags += (
        " --xla_cpu_collective_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=600"
    )
os.environ["XLA_FLAGS"] = _flags

# Persistent compilation cache: this box shows 10-50x variance in XLA
# compile times (noisy neighbour); caching compiles across processes keeps
# the suite usable. The CPU suite uses its OWN cache dir: XLA:CPU AOT
# entries embed the compile machine's CPU features, the cache key does
# not, and this VM migrates across heterogeneous hosts — loading an entry
# compiled for a former host's features SEGFAULTS (observed:
# "+prefer-no-scatter is not supported on the host machine" then SIGSEGV
# in compilation_cache.get_executable_and_time). Keeping CPU entries
# separate from the expensive TPU entries makes the remedy cheap:
# delete .jax_cache_cpu/ whenever cpu_aot_loader prints feature-mismatch
# errors.
import jax

jax.config.update("jax_platforms", "cpu")
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", _cache_dir)

# jaxlib 0.9.0 XLA:CPU cannot round-trip MULTI-DEVICE executables through
# the persistent cache (deserialize segfaults); single-device entries stay
# cached. Shared helpers so the driver's dryrun gets the same guards.
from zkdcap_tpu.parallel.mesh import (
    bypass_multidevice_compile_cache,
    ensure_cpu_cache_matches_machine,
)

ensure_cpu_cache_matches_machine(_cache_dir)
bypass_multidevice_compile_cache()
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


# Mesh-using test files run in SUBPROCESSES (tests/test_zmesh_isolated.py
# spawns one inner pytest per file). In-process, XLA:CPU multi-device
# programs destabilise jaxlib 0.9: after enough compiles accumulate,
# persistent-cache reads/writes AND raw backend_compile SEGFAULT — observed
# five times across full-suite runs, always after the mesh block, never in
# a fresh process. Isolation also keeps the main process's persistent cache
# un-poisoned (see mesh.bypass_multidevice_compile_cache). The inner run
# sets ZKDCAP_MESH_INNER=1 to re-enable collection.
MESH_TEST_FILES = ["test_mesh_prover.py", "test_mesh_real_circuit.py",
                   "test_multihost.py", "test_parallel.py"]
if not os.environ.get("ZKDCAP_MESH_INNER"):
    collect_ignore = list(MESH_TEST_FILES)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: minutes-scale test (XLA:CPU compile-heavy); "
        "kept in the default run — the persistent cache amortises it")
