"""Differential tests: device Montgomery field ops vs python bigint oracle.

Mirrors the reference's trusted-oracle differential testing style
(SURVEY.md §4: `p256` crate cross-checks at base.rs:287-306) at the field
layer: every batched op is checked against python int arithmetic.
"""

import random

import numpy as np
import pytest

from zkdcap_tpu.fields import ALL_FIELDS, BN254_FR, mont
from zkdcap_tpu.fields.params import int_to_limbs, limbs_to_int

RNG = random.Random(0xDCA9)


def rand_elems(p, n):
    return [RNG.randrange(p) for _ in range(n)]


@pytest.mark.parametrize("params", ALL_FIELDS, ids=lambda f: f.name)
def test_roundtrip(params):
    vals = rand_elems(params.p, 8) + [0, 1, params.p - 1]
    x = mont.encode_ints(params, vals)
    assert mont.decode_ints(params, x) == [v % params.p for v in vals]


@pytest.mark.parametrize("params", ALL_FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(params):
    n = 32
    a = rand_elems(params.p, n)
    b = rand_elems(params.p, n)
    da, db = mont.encode_ints(params, a), mont.encode_ints(params, b)
    assert mont.decode_ints(params, mont.add(params, da, db)) == [
        (x + y) % params.p for x, y in zip(a, b)
    ]
    assert mont.decode_ints(params, mont.sub(params, da, db)) == [
        (x - y) % params.p for x, y in zip(a, b)
    ]
    assert mont.decode_ints(params, mont.neg(params, da)) == [(-x) % params.p for x in a]


@pytest.mark.parametrize("params", ALL_FIELDS, ids=lambda f: f.name)
def test_mul(params):
    n = 64
    a = rand_elems(params.p, n) + [0, 1, params.p - 1, params.p - 1]
    b = rand_elems(params.p, n) + [params.p - 1, 1, params.p - 1, 0]
    da, db = mont.encode_ints(params, a), mont.encode_ints(params, b)
    got = mont.decode_ints(params, mont.mont_mul(params, da, db))
    assert got == [(x * y) % params.p for x, y in zip(a, b)]


@pytest.mark.parametrize("params", ALL_FIELDS, ids=lambda f: f.name)
def test_inv_pow(params):
    n = 16
    a = rand_elems(params.p, n)
    da = mont.encode_ints(params, a)
    got = mont.decode_ints(params, mont.mont_inv(params, da))
    assert got == [pow(x, -1, params.p) for x in a]
    got7 = mont.decode_ints(params, mont.mont_pow(params, da, 7))
    assert got7 == [pow(x, 7, params.p) for x in a]


def test_limb_utils():
    for _ in range(20):
        v = RNG.randrange(1 << 256)
        assert limbs_to_int(int_to_limbs(v)) == v


def test_root_of_unity():
    w = BN254_FR.root_of_unity
    p = BN254_FR.p
    assert pow(w, 1 << 28, p) == 1
    assert pow(w, 1 << 27, p) != 1
    w8 = BN254_FR.nth_root_of_unity(3)
    assert pow(w8, 8, p) == 1 and pow(w8, 4, p) != 1
