"""Full SGX DCAP proof at k=17 on the real TPU (BASELINE.md metric #3).

The reference's `test_sgx_dcap_verifier_pass` flow
(sgx_dcap_verifier.rs:763-848) on our stack, with the identical Intel demo
witness: MockProver-style checks are in tests/; this runs the REAL pipeline
(SRS -> keygen -> prove -> pairing verify).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from zkdcap_tpu.chips import CircuitBuilder
from zkdcap_tpu.circuits.dcap import build_dcap_trace, load_demo_input
from zkdcap_tpu.commit import ParamsKZG, gen_srs
from zkdcap_tpu.fields import BN254_FR, mont
from zkdcap_tpu.plonk.keygen import keygen
from zkdcap_tpu.plonk.prover import create_proof
from zkdcap_tpu.plonk.verifier import verify_proof
from zkdcap_tpu.transcript import TranscriptWriter

K = 17  # ref :765


def main():
    print(f"devices: {jax.devices()}", flush=True)
    inp = load_demo_input()
    assert inp.verify_native()

    t0 = time.time()
    trace = build_dcap_trace(inp)
    print(f"witness trace: {time.time()-t0:.1f}s ({len(trace.cells)} cells)", flush=True)

    t0 = time.time()
    builder = CircuitBuilder(K, lookup_bits=16)
    compiled = builder.compile(trace)
    print(f"layout: {time.time()-t0:.1f}s "
          f"({compiled.pinning.num_advice} advice cols)", flush=True)

    t0 = time.time()
    params = ParamsKZG(srs=gen_srs(K, cache_dir="params"))
    print(f"srs: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    pk = keygen(params, compiled.cs, compiled.fixed_values, "blake2b")
    print(f"keygen: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    advice = builder.witness_columns(compiled, trace)
    advice_dev = [mont.encode_ints(BN254_FR, col) for col in advice]
    print(f"witness fill: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    tw = TranscriptWriter("blake2b")
    proof = create_proof(params, pk, advice_dev, [], tw, timing=True)
    t_prove = time.time() - t0
    print(f"DCAP prove: {t_prove:.1f}s, proof = {len(proof)} bytes", flush=True)

    t0 = time.time()
    ok = verify_proof(params, pk.vk, [], proof)
    print(f"verify: {time.time()-t0:.1f}s -> {ok}", flush=True)
    assert ok
    bad = bytearray(proof)
    bad[100] ^= 1
    try:
        bad_ok = verify_proof(params, pk.vk, [], bytes(bad))
    except Exception:
        bad_ok = False
    assert not bad_ok, "tampered proof must fail"
    print("REJECTS tampered proof. DCAP E2E ALL OK", flush=True)
    with open("params/dcap_proof.hex", "w") as f:
        f.write("0x" + proof.hex())


if __name__ == "__main__":
    main()
