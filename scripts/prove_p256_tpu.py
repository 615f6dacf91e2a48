"""Full k=18 P-256 ECDSA proof on the real TPU: keygen -> prove -> verify.

This is the reference's `test_p256_ecdsa` flow (base.rs:293-312) on our
stack. Run: python scripts/prove_p256_tpu.py [k]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from zkdcap_tpu.circuits.p256_ecdsa import ECDSAInput
from zkdcap_tpu.runtime.prover import ECDSAProver

MSGHASH = "9c8adb93585642008f6defe84b014d3db86e65ec158f32c1fe8b78974123c264"
SIG = (
    "89e7242b7a0be99f7c668a8bdbc1fcaf6fa7562dd28538dbab4b059e9d6955c2"
    "c434593d3ccb0e7e5825effb14e251e6e5efb738d6042647ed2e2faac9191718"
)
PUBKEY = (
    "04cd8fdae57e9fcc6638b7e0bdf1cfe6eb4783c29ed13916f10c121c70b7173dd6"
    "1291422f9ef68a1b6a7e9cccbe7cc2c0738f81a996f7e62e9094c1f80bc0d788"
)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    print(f"devices: {jax.devices()}", flush=True)
    inp = ECDSAInput.from_hex(MSGHASH, SIG, PUBKEY)
    assert inp.verify_native()
    prover = ECDSAProver(params_dir="params", k=k)

    t0 = time.time()
    prover.keygen()
    print(f"keygen: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    proof = prover.create_proof(inp)
    t_prove = time.time() - t0
    print(f"prove: {t_prove:.1f}s, proof = {len(proof)} bytes", flush=True)

    t0 = time.time()
    ok = prover.verify(inp.as_instances(), proof)
    print(f"verify: {time.time()-t0:.1f}s -> {ok}", flush=True)
    assert ok, "proof must verify"

    bad = list(inp.as_instances())
    bad[0] ^= 1
    assert not prover.verify(bad, proof), "bad instances must fail"
    print("REJECTS bad instances. ALL OK", flush=True)
    with open("params/p256_proof.hex", "w") as f:
        f.write("0x" + proof.hex())


if __name__ == "__main__":
    main()
