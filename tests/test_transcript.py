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
