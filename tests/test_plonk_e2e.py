"""PLONK core end-to-end: tiny circuit -> mock check -> prove -> verify.

The TPU analog of the reference's single integration test
(`test_sgx_dcap_verifier_pass`, SURVEY.md §4): MockProver satisfiability
first, then the real pipeline (SRS -> keygen -> proof -> pairing verify).
"""

import pytest

from zkdcap_tpu.commit import ParamsKZG, gen_srs
from zkdcap_tpu.fields import BN254_FR, mont
from zkdcap_tpu.plonk.cs import ConstraintSystem
from zkdcap_tpu.plonk.keygen import keygen
from zkdcap_tpu.plonk.mock import MockProver
from zkdcap_tpu.plonk.prover import create_proof
from zkdcap_tpu.plonk.verifier import verify_proof
from zkdcap_tpu.transcript import TranscriptWriter

K = 4
N = 1 << K


def build_cs():
    cs = ConstraintSystem()
    q = cs.fixed_column()
    t = cs.fixed_column()
    a = cs.advice_column()
    b = cs.advice_column()
    c = cs.advice_column()
    p = cs.instance_column()
    cs.create_gate("mul", q.query() * (a.query() * b.query() - c.query()))
    cs.add_lookup("range8", [a.query()], [t.query()])
    cs.copy((b, 0), (b, 1))
    cs.copy((c, 0), (p, 0))
    return cs, (q, t, a, b, c, p)


def witness():
    q_vals = [1, 1] + [0] * (N - 2)
    t_vals = list(range(8)) + [0] * (N - 8)
    a_vals = [2, 3, 5] + [0] * (N - 3)
    b_vals = [3, 3] + [0] * (N - 2)
    c_vals = [6, 9] + [0] * (N - 2)
    inst = [6]
    return q_vals, t_vals, a_vals, b_vals, c_vals, inst


def test_mock_prover_pass_and_fail():
    cs, _ = build_cs()
    q_vals, t_vals, a_vals, b_vals, c_vals, inst = witness()
    mp = MockProver(K, cs, [q_vals, t_vals], [a_vals, b_vals, c_vals], [inst])
    mp.assert_satisfied()

    bad_c = list(c_vals)
    bad_c[1] = 10  # 3*3 != 10
    mp2 = MockProver(K, cs, [q_vals, t_vals], [a_vals, b_vals, bad_c], [inst])
    fails = mp2.verify()
    assert any(f.kind == "gate" for f in fails)

    bad_a = list(a_vals)
    bad_a[2] = 9  # not in table 0..7
    mp3 = MockProver(K, cs, [q_vals, t_vals], [bad_a, b_vals, c_vals], [inst])
    fails = mp3.verify()
    assert any(f.kind == "lookup" for f in fails)

    bad_b = list(b_vals)
    bad_b[1] = 4  # breaks copy b0==b1
    mp4 = MockProver(K, cs, [q_vals, t_vals], [a_vals, bad_b, c_vals], [inst])
    fails = mp4.verify()
    assert any(f.kind in ("copy", "gate") for f in fails)


@pytest.fixture(scope="module")
def params(tmp_path_factory):
    cache = tmp_path_factory.mktemp("srs")
    return ParamsKZG(srs=gen_srs(K, cache_dir=str(cache)))


def test_prove_verify_poseidon_and_keccak(params):
    """Stack-B transcript parity: the same circuit proves under the
    Poseidon (native) and Keccak (EVM, uncompressed points) transcripts."""
    from zkdcap_tpu.plonk.keygen import keygen as kg

    cs, _ = build_cs()
    q_vals, t_vals, a_vals, b_vals, c_vals, inst = witness()
    for kind in ("poseidon", "keccak"):
        pk = kg(params, cs, [q_vals, t_vals], transcript_kind=kind)
        advice_dev = [mont.encode_ints(BN254_FR, col) for col in (a_vals, b_vals, c_vals)]
        tw = TranscriptWriter(kind)
        proof = create_proof(params, pk, advice_dev, [inst], tw)
        assert verify_proof(params, pk.vk, [inst], proof)
        assert not verify_proof(params, pk.vk, [[9]], proof)


def test_prove_verify(params):
    cs, _ = build_cs()
    q_vals, t_vals, a_vals, b_vals, c_vals, inst = witness()
    pk = keygen(params, cs, [q_vals, t_vals])

    advice_dev = [mont.encode_ints(BN254_FR, col) for col in (a_vals, b_vals, c_vals)]
    tw = TranscriptWriter("blake2b")
    proof = create_proof(params, pk, advice_dev, [inst], tw)
    assert len(proof) > 0
    assert verify_proof(params, pk.vk, [inst], proof)

    # wrong instance must fail
    assert not verify_proof(params, pk.vk, [[7]], proof)

    # bit-flip anywhere must fail
    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 1
    try:
        ok = verify_proof(params, pk.vk, [inst], bytes(bad))
    except Exception:
        ok = False
    assert not ok
