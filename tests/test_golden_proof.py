"""Golden-proof regression (reference `test_cli_verify`, SURVEY.md §4 row 3).

Verifies a committed proof (`assets/p256_proof.hex`, generated on TPU by
scripts/prove_p256_tpu.py) against the committed vk — pinning the transcript
format, serialization, challenge schedule and vk compatibility exactly like
the reference's 1,504-byte golden proof (`bin/assets/proof.bin`).

Verification needs no G1 SRS powers (only the host G2 points, which derive
from the deterministic dev tau), so this runs without the 22 MB SRS cache.
"""

import json
import os

import pytest

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")


@pytest.mark.slow
def test_golden_p256_proof_verifies():
    from zkdcap_tpu.chips import CircuitBuilder, Pinning
    from zkdcap_tpu.circuits.p256_ecdsa import ECDSAInput, build_ecdsa_trace
    from zkdcap_tpu.commit.kzg import ParamsKZG
    from zkdcap_tpu.commit.srs import SRS, _dev_tau
    from zkdcap_tpu.curves.pairing import G2_GEN, g2_mul
    from zkdcap_tpu.plonk.keygen import VerifyingKey
    from zkdcap_tpu.plonk.verifier import verify_proof
    from zkdcap_tpu.runtime.prover import ECDSAProver, SAMPLE_INPUT

    with open(os.path.join(ASSETS, "vk_k18.json")) as f:
        vk_data = json.load(f)
    with open(os.path.join(ASSETS, "pinning_k18.json")) as f:
        pinning = Pinning.from_json(f.read())
    with open(os.path.join(ASSETS, "p256_proof.hex")) as f:
        proof = bytes.fromhex(f.read().strip().removeprefix("0x"))

    # rebuild the circuit structure deterministically against the pinning
    trace = build_ecdsa_trace(SAMPLE_INPUT, lookup_bits=17)
    compiled = CircuitBuilder(18, lookup_bits=17).compile(trace, pinning)
    vk = VerifyingKey(
        k=18,
        cs=compiled.cs,
        fixed_commitments=[tuple(c) if c else None for c in vk_data["fixed_commitments"]],
        permutation_commitments=[
            tuple(c) if c else None for c in vk_data["permutation_commitments"]
        ],
        transcript_kind=vk_data["transcript"],
    )
    # verifier-side params: only the host G2 points are needed
    tau = _dev_tau()
    srs = SRS(k=18, g1_powers=None, g2=G2_GEN, s_g2=g2_mul(tau, G2_GEN), g1=(1, 2))
    params = ParamsKZG(srs=srs)

    # the proof was generated for the reference test vector's instances
    from test_p256_circuit import REF_MSGHASH, REF_PUBKEY, REF_SIG

    inp = ECDSAInput.from_hex(REF_MSGHASH, REF_SIG, REF_PUBKEY)
    assert verify_proof(params, vk, [inp.as_instances()], proof)
    bad = list(inp.as_instances())
    bad[3] ^= 1
    assert not verify_proof(params, vk, [bad], proof)
