"""ECC chip + ECDSA gadget: mock-level differential tests vs host curve."""

import random

import pytest

from zkdcap_tpu.chips import CircuitBuilder, Context, FlexGate, RangeChip
from zkdcap_tpu.chips.bigint import BigIntChip
from zkdcap_tpu.chips.ecc import EccChip, aux_point
from zkdcap_tpu.chips.ecdsa import ecdsa_verify_no_pubkey_check
from zkdcap_tpu.curves.host_curve import SECP256R1, p256_ecdsa_verify
from zkdcap_tpu.plonk.mock import MockProver

RNG = random.Random(9)
C = SECP256R1


def make(k=11, lookup_bits=10):
    ctx = Context()
    g = FlexGate(ctx)
    rc = RangeChip(g, lookup_bits)
    fp = BigIntChip(rc, C.p)
    ecc = EccChip(fp, C)
    return ctx, g, rc, fp, ecc


def run_mock(ctx, k=11, lookup_bits=10):
    builder = CircuitBuilder(k, lookup_bits=lookup_bits)
    compiled = builder.compile(ctx)
    advice = builder.witness_columns(compiled, ctx)
    mp = MockProver(k, compiled.cs, compiled.fixed_values, advice, builder.instance_values(ctx))
    return mp, compiled


def test_aux_points_on_curve():
    for tag in (b"table0", b"table1", b"acc"):
        assert C.is_on_curve(aux_point(C, tag))


def test_add_double():
    ctx, g, rc, fp, ecc = make()
    P1 = C.mul(RNG.randrange(1, C.n), C.g)
    P2 = C.mul(RNG.randrange(1, C.n), C.g)
    A = ecc.load_private(P1, check_on_curve=True)
    B = ecc.load_private(P2, check_on_curve=True)
    S = ecc.add_unequal(A, B)
    assert S.host == C.add(P1, P2)
    assert (S.x.value % C.p, S.y.value % C.p) == C.add(P1, P2)
    D = ecc.double(A)
    assert (D.x.value % C.p, D.y.value % C.p) == C.add(P1, P1)
    mp, _ = run_mock(ctx)
    mp.assert_satisfied()


def test_ecdsa_gadget_mock():
    # generate a valid P-256 signature with known private key
    d = RNG.randrange(1, C.n)
    pub = C.mul(d, C.g)
    z = RNG.randrange(C.n)  # msghash
    kk = RNG.randrange(1, C.n)
    pt = C.mul(kk, C.g)
    r = pt[0] % C.n
    s = pow(kk, -1, C.n) * (z + r * d) % C.n
    assert r and s
    assert p256_ecdsa_verify(z, r, s, pub)

    ctx, g, rc, fp, ecc = make(k=15, lookup_bits=14)
    fq = BigIntChip(rc, C.n)
    pk = ecc.load_private(pub)
    r_c = fq.load_private(r)
    s_c = fq.load_private(s)
    m_c = fq.load_private(z)
    res = ecdsa_verify_no_pubkey_check(ecc, fq, pk, r_c, s_c, m_c)
    g.assert_const(res, 1)
    print(f"ecdsa cells: {len(ctx.cells)}, lookups: {len(ctx.lookup_cells)}")

    mp, compiled = run_mock(ctx, k=15, lookup_bits=14)
    print(f"advice cols: {compiled.pinning.num_advice}, lookup cols: {compiled.pinning.num_lookup_advice}")
    mp.assert_satisfied()


def test_ecdsa_gadget_rejects_bad_sig():
    d = RNG.randrange(1, C.n)
    pub = C.mul(d, C.g)
    z = RNG.randrange(C.n)
    kk = RNG.randrange(1, C.n)
    r = C.mul(kk, C.g)[0] % C.n
    s = pow(kk, -1, C.n) * (z + r * d) % C.n
    bad_z = (z + 1) % C.n

    ctx, g, rc, fp, ecc = make(k=15, lookup_bits=14)
    fq = BigIntChip(rc, C.n)
    pk = ecc.load_private(pub)
    with pytest.raises(AssertionError):
        # witness generation itself must fail on the x(R) == r check
        ecdsa_verify_no_pubkey_check(
            ecc, fq, pk, fq.load_private(r), fq.load_private(s), fq.load_private(bad_z)
        )
