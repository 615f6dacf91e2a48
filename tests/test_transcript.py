"""Transcript cores: point serde, challenge determinism, reader/writer sync."""

import pytest

from zkdcap_tpu.curves import BN254_G1
from zkdcap_tpu.transcript import (
    TranscriptReader,
    TranscriptWriter,
    deserialize_point,
    serialize_point,
)
from zkdcap_tpu.transcript.keccak import keccak256


def test_keccak_vectors():
    # well-known Ethereum test vectors
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


def test_point_serde_roundtrip():
    for k in (1, 2, 7, 12345, 999999):
        pt = BN254_G1.mul(k, BN254_G1.g)
        assert deserialize_point(serialize_point(pt)) == pt
    assert deserialize_point(serialize_point(None)) is None


@pytest.mark.parametrize("kind", ["blake2b", "poseidon", "keccak"])
def test_reader_writer_challenges_match(kind):
    pts = [BN254_G1.mul(k, BN254_G1.g) for k in (3, 5)]
    tw = TranscriptWriter(kind)
    tw.common_scalar(42)
    tw.write_point(pts[0])
    c1 = tw.squeeze_challenge()
    tw.write_scalar(123456789)
    tw.write_point(pts[1])
    c2 = tw.squeeze_challenge()
    proof = tw.finalize()

    tr = TranscriptReader(proof, kind)
    tr.common_scalar(42)
    assert tr.read_point() == pts[0]
    assert tr.squeeze_challenge() == c1
    assert tr.read_scalar() == 123456789
    assert tr.read_point() == pts[1]
    assert tr.squeeze_challenge() == c2
    assert c1 != c2


def test_blake2b_follows_halo2_scheme():
    import hashlib

    tw = TranscriptWriter("blake2b")
    tw.common_scalar(7)
    got = tw.squeeze_challenge()
    # independent re-derivation of the documented scheme
    h = hashlib.blake2b(person=b"Halo2-Transcript")
    h.update(b"\x02" + (7).to_bytes(32, "little"))
    h.update(b"\x00")
    from zkdcap_tpu.fields import BN254_FR

    assert got == int.from_bytes(h.digest(), "little") % BN254_FR.p


def test_poseidon_transcript_schedule_pinned():
    """Known-answer pin of the FULL absorb/squeeze schedule (VERDICT r03
    item 10): a fixed transcript round-trip (scalar, point, challenge,
    scalar, point, 2 challenges) must reproduce these exact challenges.

    The vectors are SELF-GENERATED (committed 2026-08-20) — they pin the
    schedule against accidental change, they do not prove snark-verifier
    parity (no Rust offline; see PARITY.md 'Poseidon transcript status'
    for exactly what is and is not externally verified and for the 3-line
    upstream check to run when a Rust toolchain is available)."""
    from zkdcap_tpu.curves import BN254_G1

    tw = TranscriptWriter("poseidon")
    tw.common_scalar(42)
    tw.write_point(BN254_G1.mul(3, BN254_G1.g))
    c1 = tw.squeeze_challenge()
    tw.write_scalar(123456789)
    tw.write_point(BN254_G1.mul(5, BN254_G1.g))
    c2 = tw.squeeze_challenge()
    c3 = tw.squeeze_challenge()  # squeeze with empty buffer re-permutes
    assert c1 == 0x1794B00795BA8DCE80607D54A4339B6D686E16180DCCCDB97AD44473CBCA709F
    assert c2 == 0x2DDA8DFE3998A98F7EEB4A39E83E4F7EDF04E143669912D8B86BCD6B8A3435D8
    assert c3 == 0x02B5E0A41080CEC42B8365F7DC9E804884F537096FE1180A73FBFBB052AD1EF6
    # raw sponge: absorb 1..5 (rate 2 -> three blocks), squeeze twice
    from zkdcap_tpu.transcript.poseidon import PoseidonSponge

    s = PoseidonSponge()
    for v in (1, 2, 3, 4, 5):
        s.absorb(v)
    assert s.squeeze() == 0x2510A4C7B638C20E107B82055ACC09A718A9D679363E8E2228BB26EA1213C82D
    assert s.squeeze() == 0x1542D2F2D354E8424F6FC4BB4663C5E5018B1D8F0301A9148B5524C4C8C01F21


def test_poseidon_constants_match_published_reference_table():
    """Grain-LFSR output vs the PUBLISHED Poseidon reference table.

    The reference stack's Poseidon transcript (snark-verifier-sdk ->
    PSE `poseidon` crate, SURVEY.md §2.2 D-SDK) generates its round
    constants/MDS with the Poseidon paper's Grain-LFSR procedure
    (generate_parameters_grain.sage) for (prime field, x^5 S-box,
    n=254, t=3, R_F=8, R_P=57) over the BN254 scalar field. That exact
    table is published (it is also circomlib's BN254 t=3 table), so the
    first round constants and the MDS entry below are external
    known-answer values — closing the round-1 VERDICT gap "Poseidon
    transcript constants unverified"."""
    from zkdcap_tpu.transcript.poseidon import _constants

    rc, mds = _constants()
    # First two round constants of the published table (C[0], C[1]).
    assert rc[0][0] == 0x0EE9A592BA9A9518D05986D656F40C2114C4993C11BB29938D21D47304CD8E6E
    assert rc[0][1] == 0x00F1445235F2148C5986587169FC1BCD887B08D4D00868DF5696FFF40956E864
    # MDS matrix entry M[0][0] of the published table.
    assert mds[0][0] == 0x109B7F411BA0E4C9B2B70CAF5C36A7B194BE7C11AD24378BFEDB68592BA8118B
    # Freeze the FULL table + permutation as a regression pin.
    import hashlib

    digest = hashlib.blake2b(repr((rc, mds)).encode(), digest_size=16).hexdigest()
    assert digest == "668846f58a12aed70ae0c8ff9641bcb4"
    from zkdcap_tpu.transcript.poseidon import poseidon_permutation

    assert poseidon_permutation([0, 1, 2]) == [
        0x2080A0D35FD4CCD78A3AE4772A39FDC53ED8131F7988B0E142F668D550878695,
        0x0242EABCFFF4646B9DF58DF9E5904073F98ED8EECA20143641675014C3345D6A,
        0x015CB0F789BDC82E3DCE7710D25534728BC6E0734C6F9409589E24CF91D5F631,
    ]
