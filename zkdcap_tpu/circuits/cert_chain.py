"""Certificate-chain verification circuit (reference roadmap item).

The reference's README roadmap (`README.md:10-51`, SURVEY.md §0) lists
cert-chain checking against Intel's Root CA as an unimplemented target; the
driver's north star includes it ("Cert-chain circuit: Root CA ->
intermediate -> leaf (2x ECDSA + SHA-256)", BASELINE.json configs[3]).

Each link proves: SHA-256(tbs_i) is ECDSA-signed by the issuer's subject
public key, which is itself embedded in tbs_{i+1} at a known offset; the
chain terminates at a trust-anchor public key baked in as circuit
constants. This composes the same chips as the DCAP circuit (base64 is
orthogonal; chains operate on DER bytes directly).
"""

from __future__ import annotations

import dataclasses
import hashlib

from ..chips import Context, FlexGate, RangeChip
from ..chips.bigint import BigIntChip
from ..chips.ecc import EccChip, EcPoint
from ..chips.ecdsa import ecdsa_verify_no_pubkey_check
from ..chips.sha256 import Sha256Chip
from ..curves.host_curve import SECP256R1, p256_ecdsa_verify
from .dcap import _crt_from_be_bytes


@dataclasses.dataclass(frozen=True)
class CertLink:
    tbs: bytes  # to-be-signed bytes of this certificate
    r: int
    s: int
    pubkey_offset: int  # offset of the SUBJECT pubkey (0x04 tag) inside tbs


@dataclasses.dataclass(frozen=True)
class CertChainInput:
    """links[0] = leaf ... links[-1] signed by the trust anchor."""

    links: list[CertLink]
    root_pubkey: tuple[int, int]  # trust anchor (circuit constant)

    def issuer_pubkey(self, i: int) -> tuple[int, int]:
        if i + 1 < len(self.links):
            tbs = self.links[i + 1].tbs
            off = self.links[i + 1].pubkey_offset
            assert tbs[off] == 0x04
            return (
                int.from_bytes(tbs[off + 1 : off + 33], "big"),
                int.from_bytes(tbs[off + 33 : off + 65], "big"),
            )
        return self.root_pubkey

    def verify_native(self) -> bool:
        n = SECP256R1.n
        for i, link in enumerate(self.links):
            z = int.from_bytes(hashlib.sha256(link.tbs).digest(), "big") % n
            if not p256_ecdsa_verify(z, link.r, link.s, self.issuer_pubkey(i)):
                return False
        return True


def build_cert_chain_trace(inp: CertChainInput, lookup_bits: int = 16) -> Context:
    ctx = Context()
    gate = FlexGate(ctx)
    rc = RangeChip(gate, lookup_bits)
    fp = BigIntChip(rc, SECP256R1.p)
    fq = BigIntChip(rc, SECP256R1.n)
    ecc = EccChip(fp, SECP256R1)
    sha = Sha256Chip(gate, rc)

    # load each cert's tbs bytes as witness cells
    tbs_cells: list[list[int]] = []
    for link in inp.links:
        cells = []
        for b in link.tbs:
            c = ctx.push(b)
            rc.range_check(c, 8)
            cells.append(c)
        tbs_cells.append(cells)

    for i, link in enumerate(inp.links):
        digest = sha.digest_bytes(tbs_cells[i], list(link.tbs))
        m = _crt_from_be_bytes(
            fq, gate, [c for c, _ in digest], [v for _, v in digest]
        )
        if i + 1 < len(inp.links):
            # issuer pubkey from the NEXT cert's tbs cells (binding!)
            off = inp.links[i + 1].pubkey_offset
            nxt = tbs_cells[i + 1]
            nxt_vals = list(inp.links[i + 1].tbs)
            gate.assert_const(nxt[off], 0x04)
            xb_c = nxt[off + 1 : off + 33]
            xb_v = nxt_vals[off + 1 : off + 33]
            yb_c = nxt[off + 33 : off + 65]
            yb_v = nxt_vals[off + 33 : off + 65]
            pk_x = _crt_from_be_bytes(fp, gate, xb_c, xb_v)
            pk_y = _crt_from_be_bytes(fp, gate, yb_c, yb_v)
            pk = EcPoint(pk_x, pk_y, (pk_x.value, pk_y.value))
        else:
            pk = ecc.load_constant(inp.root_pubkey)  # trust anchor
        r = fq.load_private(link.r)
        s = fq.load_private(link.s)
        res = ecdsa_verify_no_pubkey_check(ecc, fq, pk, r, s, m)
        gate.assert_const(res, 1)
    return ctx


def make_demo_chain(n_links: int = 2, tbs_len: int = 256, seed: int = 7):
    """Synthetic chain for tests: issuer keys embedded at offset 100."""
    import random

    rng = random.Random(seed)
    c = SECP256R1
    keys = [rng.randrange(1, c.n) for _ in range(n_links + 1)]
    pubs = [c.mul(d, c.g) for d in keys]
    off = 100
    links = []
    tbs_list = []
    for i in range(n_links):
        tbs = bytearray(rng.randrange(256) for _ in range(tbs_len))
        if i > 0:
            # embed THIS cert's subject pubkey (it signs cert i-1)
            tbs[off] = 0x04
            tbs[off + 1 : off + 33] = pubs[i][0].to_bytes(32, "big")
            tbs[off + 33 : off + 65] = pubs[i][1].to_bytes(32, "big")
        tbs_list.append(bytes(tbs))
    for i in range(n_links):
        signer = keys[i + 1]  # issuer of cert i
        z = int.from_bytes(hashlib.sha256(tbs_list[i]).digest(), "big") % c.n
        k = rng.randrange(1, c.n)
        r = c.mul(k, c.g)[0] % c.n
        s = pow(k, -1, c.n) * (z + r * signer) % c.n
        links.append(CertLink(tbs=tbs_list[i], r=r, s=s, pubkey_offset=off))
    return CertChainInput(links=links, root_pubkey=pubs[n_links])
