"""DCAP k=17 prove on the real TPU: cold (compile) + warm timings.

Measures the effect of the per-pk jitted round programs: the second
proof in the same process reuses every compiled executable, so its
wall-clock is the steady-state serving number (BASELINE.md metric #3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    from zkdcap_tpu.circuits.dcap import load_demo_input
    from zkdcap_tpu.runtime.dcap_prover import DcapProver

    prover = DcapProver(params_dir="params")
    inp = load_demo_input()

    t0 = time.time()
    prover.keygen()
    print(f"artifact load/keygen: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    proof = prover.create_proof(inp, timing=True)
    print(f"DCAP prove COLD: {time.time()-t0:.1f}s ({len(proof)} bytes)", flush=True)

    t0 = time.time()
    proof2 = prover.create_proof(inp, timing=True)
    print(f"DCAP prove WARM: {time.time()-t0:.1f}s ({len(proof2)} bytes)", flush=True)

    t0 = time.time()
    ok = prover.verify(proof2)
    print(f"verify: {time.time()-t0:.1f}s -> {ok}", flush=True)
    assert ok


if __name__ == "__main__":
    main()
