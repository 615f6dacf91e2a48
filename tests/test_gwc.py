"""GWC19 multiopen backend (halo2 ProverGWC/VerifierGWC alternative to
SHPLONK — same selectable pair as halo2_proofs' poly::kzg::multiopen)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_plonk_e2e import K, build_cs, witness

from zkdcap_tpu.commit import ParamsKZG, gen_srs
from zkdcap_tpu.fields import BN254_FR, mont
from zkdcap_tpu.plonk.keygen import keygen
from zkdcap_tpu.plonk.prover import create_proof
from zkdcap_tpu.plonk.verifier import verify_proof
from zkdcap_tpu.transcript import TranscriptWriter


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cache = tmp_path_factory.mktemp("srs")
    params = ParamsKZG(srs=gen_srs(K, cache_dir=str(cache)))
    cs, _ = build_cs()
    q_vals, t_vals, a_vals, b_vals, c_vals, inst = witness()
    pk = keygen(params, cs, [q_vals, t_vals])
    advice = [mont.encode_ints(BN254_FR, col) for col in (a_vals, b_vals, c_vals)]
    return params, pk, advice, inst


def test_gwc_prove_verify_and_reject(setup):
    params, pk, advice, inst = setup
    proof = create_proof(params, pk, advice, [inst], TranscriptWriter("blake2b"),
                         blinding_seed=b"gwc", multiopen="gwc")
    assert verify_proof(params, pk.vk, [inst], proof, multiopen="gwc")
    assert not verify_proof(params, pk.vk, [[9]], proof, multiopen="gwc")
    # a tampered byte in the opening proof must be rejected
    bad = bytearray(proof)
    bad[-7] ^= 1
    assert not verify_proof(params, pk.vk, [inst], bytes(bad), multiopen="gwc")


def test_gwc_and_shplonk_are_distinct_wire_formats(setup):
    params, pk, advice, inst = setup
    gwc = create_proof(params, pk, advice, [inst], TranscriptWriter("blake2b"),
                       blinding_seed=b"x", multiopen="gwc")
    shp = create_proof(params, pk, advice, [inst], TranscriptWriter("blake2b"),
                       blinding_seed=b"x")
    # GWC writes one W per distinct point (>2), SHPLONK exactly two
    assert len(gwc) > len(shp)

    def rejects(fn):
        try:
            return not fn()
        except (ValueError, IndexError):  # truncated/garbage read also rejects
            return True

    assert rejects(lambda: verify_proof(params, pk.vk, [inst], gwc))
    assert rejects(lambda: verify_proof(params, pk.vk, [inst], shp, multiopen="gwc"))


def test_gwc_evm_verifier_executes(setup):
    """GWC Solidity emission + EVM execution: the selectable multiopen pair
    is complete end-to-end (prover, native verifier, contract)."""
    from zkdcap_tpu.evm.calldata import encode_calldata
    from zkdcap_tpu.evm.interp import EvmRevert, deploy_and_call
    from zkdcap_tpu.evm.solc import compile_solidity
    from zkdcap_tpu.evm.solidity import gen_evm_verifier

    params, _, advice, inst = setup
    cs, _ = build_cs()
    q_vals, t_vals, *_ = witness()
    pk = keygen(params, cs, [q_vals, t_vals], transcript_kind="keccak")
    proof = create_proof(params, pk, advice, [inst], TranscriptWriter("keccak"),
                         multiopen="gwc")
    assert verify_proof(params, pk.vk, [inst], proof, multiopen="gwc")
    src = gen_evm_verifier(params, pk.vk, num_instances=1, multiopen="gwc")
    code = compile_solidity(src)
    calldata = encode_calldata(inst, proof)
    assert deploy_and_call(code, calldata) == b"\x01"
    for frac in (0.1, 0.5, 0.9):
        bad = bytearray(proof)
        bad[int(len(bad) * frac)] ^= 1
        try:
            assert deploy_and_call(code, encode_calldata(inst, bytes(bad))) != b"\x01"
        except EvmRevert:
            pass
    try:
        assert deploy_and_call(code, encode_calldata([inst[0] + 1], proof)) != b"\x01"
    except EvmRevert:
        pass
