"""Device G1 complete-formula tests vs the host Jacobian oracle."""

import random

import jax.numpy as jnp

from zkdcap_tpu.curves import BN254_G1
from zkdcap_tpu.curves.device_g1 import (
    G1_SPEC,
    affine_to_projective,
    decode_points,
    ec_add,
    ec_double,
    ec_inf,
    encode_points,
)

RNG = random.Random(3)


def rand_points(n):
    return [BN254_G1.mul(RNG.randrange(1, BN254_G1.n), BN254_G1.g) for _ in range(n)]


def test_add_random_and_edges():
    n = 6
    ps = rand_points(n)
    qs = rand_points(n - 3) + [ps[3], BN254_G1.neg_pt(ps[4]), None]
    P = affine_to_projective(G1_SPEC, encode_points(G1_SPEC, ps))
    Q = affine_to_projective(G1_SPEC, encode_points(G1_SPEC, qs))
    got = decode_points(G1_SPEC, ec_add(G1_SPEC, P, Q))
    expect = [BN254_G1.add(a, b) for a, b in zip(ps, qs)]
    assert got == expect


def test_double_and_inf():
    ps = rand_points(3) + [None]
    P = affine_to_projective(G1_SPEC, encode_points(G1_SPEC, ps))
    got = decode_points(G1_SPEC, ec_double(G1_SPEC, P))
    expect = [BN254_G1.add(a, a) for a in ps]
    assert got == expect
    # inf + inf, inf + P
    I = ec_inf(G1_SPEC, (2,))
    gi = decode_points(G1_SPEC, ec_add(G1_SPEC, I, I))
    assert gi == [None, None]
    P2 = affine_to_projective(G1_SPEC, encode_points(G1_SPEC, rand_points(2)))
    mixed = decode_points(G1_SPEC, ec_add(G1_SPEC, I, P2))
    assert mixed == decode_points(G1_SPEC, P2)


def test_add_chain_matches_mul():
    g = BN254_G1.g
    P = affine_to_projective(G1_SPEC, encode_points(G1_SPEC, [g]))
    acc = P
    for k in range(2, 10):
        acc = ec_add(G1_SPEC, acc, P)
        assert decode_points(G1_SPEC, acc) == [BN254_G1.mul(k, g)]
