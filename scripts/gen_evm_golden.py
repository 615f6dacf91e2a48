#!/usr/bin/env python
"""Generate the committed k=18 keccak-transcript golden proof + calldata
for the REAL 15-instance EVM verifier test (VERDICT r03 item 3).

Proof bytes are backend-independent (blinding is seeded, transcripts are
host-side), so this runs on CPU or TPU; the resulting assets let the suite
compile the real k=18 Solidity verifier and EXECUTE it on real calldata
without re-proving (tests/test_evm_exec.py::test_k18_real_verifier_*).

Writes: assets/p256_evm_proof.hex (keccak proof for SAMPLE_INPUT).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# the image's sitecustomize registers the axon plugin in every process, so
# honouring JAX_PLATFORMS=cpu needs an explicit config update before first
# backend use (see tests/conftest.py)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from zkdcap_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from zkdcap_tpu.runtime.prover import SAMPLE_INPUT, ECDSAProver  # noqa: E402

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")


def main():
    params_dir = sys.argv[1] if len(sys.argv) > 1 else "params"
    prover = ECDSAProver(params_dir=params_dir)
    t0 = time.time()
    prover.keygen()
    print(f"keygen: {time.time()-t0:.1f}s", flush=True)
    # parity check vs the committed blake2b-era vk (commitments are
    # transcript-independent)
    import json

    with open(os.path.join(ASSETS, "vk_k18.json")) as f:
        committed = json.load(f)
    ours = [list(c) if c else None for c in prover._pk.vk.fixed_commitments]
    assert ours == committed["fixed_commitments"], "vk drifted vs committed asset"
    t0 = time.time()
    proof = prover.create_proof(SAMPLE_INPUT, evm=True, self_verify=False)
    print(f"prove(evm): {time.time()-t0:.1f}s, {len(proof)} bytes", flush=True)
    ok = prover.verify(SAMPLE_INPUT.as_instances(), proof, evm=True)
    print(f"EVM contract verify: {ok}", flush=True)
    assert ok
    with open(os.path.join(ASSETS, "p256_evm_proof.hex"), "w") as f:
        f.write("0x" + proof.hex())
    print("wrote assets/p256_evm_proof.hex", flush=True)


if __name__ == "__main__":
    main()
