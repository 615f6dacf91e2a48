"""BN254 pairing sanity: curve membership, bilinearity, KZG-style checks."""

from zkdcap_tpu.curves import BN254_G1
from zkdcap_tpu.curves.pairing import (
    B2,
    FINAL_EXP,
    G2_GEN,
    P,
    R_ORDER,
    Fq12,
    g2_add,
    g2_is_on_curve,
    g2_mul,
    g2_neg,
    pairing,
    pairing_product_is_one,
)


def test_g2_generator_on_curve():
    assert g2_is_on_curve(G2_GEN)
    assert g2_mul(R_ORDER, G2_GEN) is None  # order r


def test_final_exp_divides():
    assert (P**12 - 1) % R_ORDER == 0
    assert (P**4 - P**2 + 1) % R_ORDER == 0
    assert FINAL_EXP == (P**12 - 1) // R_ORDER


def test_bilinearity():
    g1 = BN254_G1.g
    e = pairing(G2_GEN, g1)
    assert not (e == Fq12.one())
    # e(2P, Q) == e(P, Q)^2 == e(P, 2Q)
    e2a = pairing(G2_GEN, BN254_G1.mul(2, g1))
    e2b = pairing(g2_mul(2, G2_GEN), g1)
    assert e2a == e * e
    assert e2b == e * e
    # order r in GT
    assert e.pow(R_ORDER) == Fq12.one()


def test_pairing_product_kzg_style():
    # e(aG1, bG2) * e(-abG1, G2) == 1
    a, b = 1234567, 7654321
    g1 = BN254_G1.g
    pairs = [
        (BN254_G1.mul(a, g1), g2_mul(b, G2_GEN)),
        (BN254_G1.neg_pt(BN254_G1.mul(a * b, g1)), G2_GEN),
    ]
    assert pairing_product_is_one(pairs)
    bad = [
        (BN254_G1.mul(a, g1), g2_mul(b, G2_GEN)),
        (BN254_G1.neg_pt(BN254_G1.mul(a * b + 1, g1)), G2_GEN),
    ]
    assert not pairing_product_is_one(bad)
