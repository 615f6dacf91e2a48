"""Fiat–Shamir transcripts (host-side; one host<->device sync per round).

Three hash cores with one read/write API, mirroring the reference's three
transcripts (SURVEY.md §0 table: Blake2b for stack A at
`circuits/src/sgx_dcap_verifier.rs:813,829`; Poseidon native / Keccak EVM
for stack B via snark-verifier-sdk, `crates/p256-ecdsa/src/base.rs:228,262`).

Proof wire format (documented, versioned):
  * G1 point: 32 bytes = x in LE with flag bits in the top byte
    (bit7 = y is odd, bit6 = infinity). BN254 Fq is 254 bits so both are free.
  * Scalar: 32 bytes LE.
Blake2b follows halo2 0.2's scheme exactly: personalisation
b"Halo2-Transcript", prefix bytes challenge=0 / point=1 / scalar=2, and
challenges = 64-byte digest reduced mod r (the digest is fed back into the
running state).
"""

from __future__ import annotations

import hashlib

from ..curves.host_curve import BN254_G1
from ..fields import BN254_FR
from .keccak import keccak256
from .poseidon import PoseidonSponge

R = BN254_FR.p
Q = BN254_G1.p

_PREFIX_CHALLENGE = b"\x00"
_PREFIX_POINT = b"\x01"
_PREFIX_SCALAR = b"\x02"


def serialize_point(pt) -> bytes:
    if pt is None:
        return bytes(31) + bytes([0x40])
    x, y = pt
    b = bytearray(x.to_bytes(32, "little"))
    if y & 1:
        b[31] |= 0x80
    return bytes(b)


def deserialize_point(b: bytes):
    flags = b[31]
    if flags & 0x40:
        return None
    x = int.from_bytes(bytes(b[:31]) + bytes([flags & 0x3F]), "little")
    if x >= Q:
        # canonicality: reject x >= q (proof-encoding malleability otherwise;
        # mirrors read_scalar's check — ADVICE round-1 fix)
        raise ValueError("non-canonical point coordinate")
    y2 = (x * x * x + 3) % Q
    y = pow(y2, (Q + 1) // 4, Q)
    if y * y % Q != y2:
        raise ValueError("point not on curve")
    if (y & 1) != ((flags >> 7) & 1):
        y = Q - y
    return (x, y)


class _Blake2bCore:
    def __init__(self):
        self.state = hashlib.blake2b(person=b"Halo2-Transcript")

    def absorb_point(self, pt):
        self.state.update(_PREFIX_POINT)
        if pt is None:
            # no affine coordinates; absorb a canonical marker
            self.state.update(bytes(64))
        else:
            self.state.update(pt[0].to_bytes(32, "little"))
            self.state.update(pt[1].to_bytes(32, "little"))

    def absorb_scalar(self, s: int):
        self.state.update(_PREFIX_SCALAR)
        self.state.update((s % R).to_bytes(32, "little"))

    def squeeze(self) -> int:
        self.state.update(_PREFIX_CHALLENGE)
        digest = self.state.copy().digest()
        return int.from_bytes(digest, "little") % R


class _PoseidonCore:
    def __init__(self):
        self.sponge = PoseidonSponge()

    def absorb_point(self, pt):
        # coordinates are Fq (> r): split into lo-128 / hi bits like
        # snark-verifier's limb decomposition
        if pt is None:
            self.sponge.absorb(0)
            self.sponge.absorb(0)
            return
        for c in pt:
            self.sponge.absorb(c & ((1 << 128) - 1))
            self.sponge.absorb(c >> 128)

    def absorb_scalar(self, s: int):
        self.sponge.absorb(s % R)

    def squeeze(self) -> int:
        return self.sponge.squeeze()


class _KeccakCore:
    """EVM-style transcript: challenges are keccak over the running buffer."""

    def __init__(self):
        self.buf = bytearray()

    def absorb_point(self, pt):
        if pt is None:
            self.buf += bytes(64)
        else:
            self.buf += pt[0].to_bytes(32, "big")
            self.buf += pt[1].to_bytes(32, "big")

    def absorb_scalar(self, s: int):
        self.buf += (s % R).to_bytes(32, "big")

    def squeeze(self) -> int:
        digest = keccak256(bytes(self.buf))
        self.buf = bytearray(digest)
        return int.from_bytes(digest, "big") % R


_CORES = {"blake2b": _Blake2bCore, "poseidon": _PoseidonCore, "keccak": _KeccakCore}


class TranscriptWriter:
    def __init__(self, kind: str = "blake2b"):
        self.core = _CORES[kind]()
        self.kind = kind
        self.proof = bytearray()
        # replayable op log: per-transcript-round proof checkpointing
        # (SURVEY.md §5.3) rebuilds the hash-core state by replaying this
        # (hashlib cores are not serializable)
        self.log: list[tuple[str, object]] = []

    def common_point(self, pt):
        self.log.append(("cp", pt))
        self.core.absorb_point(pt)

    def common_scalar(self, s: int):
        self.log.append(("cs", s))
        self.core.absorb_scalar(s)

    def restore(self, log) -> None:
        """Reset and replay a recorded op log (proof-checkpoint resume)."""
        self.core = _CORES[self.kind]()
        self.proof = bytearray()
        self.log = []
        for op, v in log:
            if op == "cp":
                self.common_point(v)
            elif op == "cs":
                self.common_scalar(v)
            elif op == "wp":
                self.write_point(v)
            elif op == "ws":
                self.write_scalar(v)
            elif op == "sq":
                self.squeeze_challenge()
            else:  # pragma: no cover
                raise ValueError(f"unknown transcript op {op!r}")

    def write_point(self, pt):
        self.log.append(("wp", pt))
        self.core.absorb_point(pt)
        if self.kind == "keccak":
            # EVM proofs carry uncompressed points (2x32B BE) so the
            # on-chain verifier needs no sqrt (snark-verifier convention)
            if pt is None:
                self.proof += bytes(64)
            else:
                self.proof += pt[0].to_bytes(32, "big") + pt[1].to_bytes(32, "big")
            return
        self.proof += serialize_point(pt)

    def write_scalar(self, s: int):
        self.log.append(("ws", s))
        self.core.absorb_scalar(s)
        # EVM (keccak) proofs use big-endian words — the layout the
        # generated Solidity verifier's calldataload reads directly
        # (snark-verifier convention); native proofs use LE.
        endian = "big" if self.kind == "keccak" else "little"
        self.proof += (s % R).to_bytes(32, endian)

    def squeeze_challenge(self) -> int:
        self.log.append(("sq", None))
        return self.core.squeeze()

    def finalize(self) -> bytes:
        return bytes(self.proof)


class TranscriptReader:
    def __init__(self, proof: bytes, kind: str = "blake2b"):
        self.core = _CORES[kind]()
        self.kind = kind
        self.proof = proof
        self.off = 0

    def common_point(self, pt):
        self.core.absorb_point(pt)

    def common_scalar(self, s: int):
        self.core.absorb_scalar(s)

    def read_point(self):
        if self.kind == "keccak":
            b = self.proof[self.off : self.off + 64]
            if len(b) < 64:
                raise ValueError("transcript exhausted")
            self.off += 64
            if b == bytes(64):
                pt = None
            else:
                x = int.from_bytes(b[:32], "big")
                y = int.from_bytes(b[32:], "big")
                if x >= Q or y >= Q:
                    raise ValueError("non-canonical point coordinate")
                if (y * y - (x * x * x + 3)) % Q != 0:
                    raise ValueError("point not on curve")
                pt = (x, y)
            self.core.absorb_point(pt)
            return pt
        b = self.proof[self.off : self.off + 32]
        if len(b) < 32:
            raise ValueError("transcript exhausted")
        self.off += 32
        pt = deserialize_point(b)
        self.core.absorb_point(pt)
        return pt

    def read_scalar(self) -> int:
        b = self.proof[self.off : self.off + 32]
        if len(b) < 32:
            raise ValueError("transcript exhausted")
        self.off += 32
        s = int.from_bytes(b, "big" if self.kind == "keccak" else "little")
        if s >= R:
            raise ValueError("non-canonical scalar")
        self.core.absorb_scalar(s)
        return s

    def squeeze_challenge(self) -> int:
        return self.core.squeeze()
