"""KZG + SHPLONK end-to-end: commit random polys, multiopen, pairing verify."""

import random

import pytest

from zkdcap_tpu.commit import ParamsKZG, gen_srs
from zkdcap_tpu.commit.shplonk import ProverQuery, VerifierQuery, shplonk_open, shplonk_verify
from zkdcap_tpu.fields import BN254_FR, mont
from zkdcap_tpu.poly.ops import divide_by_linear, poly_eval
from zkdcap_tpu.transcript import TranscriptReader, TranscriptWriter

RNG = random.Random(21)
R = BN254_FR.p
K = 4


@pytest.fixture(scope="module")
def params(tmp_path_factory):
    cache = tmp_path_factory.mktemp("srs")
    return ParamsKZG(srs=gen_srs(K, cache_dir=str(cache)))


def rand_poly(n):
    return mont.encode_ints(BN254_FR, [RNG.randrange(R) for _ in range(n)])


def test_poly_eval_and_divide():
    coeffs_int = [RNG.randrange(R) for _ in range(8)]
    coeffs = mont.encode_ints(BN254_FR, coeffs_int)
    x = RNG.randrange(R)
    expect = sum(c * pow(x, i, R) for i, c in enumerate(coeffs_int)) % R
    assert poly_eval(BN254_FR, coeffs, x) == expect
    q = divide_by_linear(BN254_FR, coeffs, x)
    q_int = mont.decode_ints(BN254_FR, q)
    # check (X - x) * q + f(x) == f
    recon = [0] * 8
    for i, c in enumerate(q_int[:-1]):
        recon[i + 1] = (recon[i + 1] + c) % R
        recon[i] = (recon[i] - c * x) % R
    recon[0] = (recon[0] + expect) % R
    assert recon == coeffs_int


def test_srs_consistency(params):
    # [tau^i]G should satisfy e([tau]G, G2) == e(G, [tau]G2)
    from zkdcap_tpu.curves.device_g1 import G1_SPEC
    from zkdcap_tpu.curves.pairing import pairing_product_is_one
    from zkdcap_tpu.curves.host_curve import BN254_G1
    import numpy as np
    import jax

    pts = params.srs.g1_powers
    x0 = mont.decode_ints(BN254_FR.__class__ and G1_SPEC.field, pts[0, 0])[0]
    y0 = mont.decode_ints(G1_SPEC.field, pts[0, 1])[0]
    assert (x0, y0) == BN254_G1.g
    x1 = mont.decode_ints(G1_SPEC.field, pts[1, 0])[0]
    y1 = mont.decode_ints(G1_SPEC.field, pts[1, 1])[0]
    assert BN254_G1.is_on_curve((x1, y1))
    assert pairing_product_is_one(
        [((x1, y1), params.srs.g2), (BN254_G1.neg_pt(BN254_G1.g), params.srs.s_g2)]
    )


def test_shplonk_roundtrip(params):
    n = 1 << K
    pa, pb, pc = rand_poly(n), rand_poly(n), rand_poly(n)
    x = RNG.randrange(R)
    omega = BN254_FR.nth_root_of_unity(K)
    xw = x * omega % R

    c = {name: params.commit(p) for name, p in [("a", pa), ("b", pb), ("c", pc)]}
    # a opened at {x, xw}; b, c at {x} — two rotation sets
    pqs = [
        ProverQuery("a", pa, x),
        ProverQuery("a", pa, xw),
        ProverQuery("b", pb, x),
        ProverQuery("c", pc, x),
    ]
    evals = {(q.name, q.point % R): poly_eval(BN254_FR, q.poly, q.point) for q in pqs}

    tw = TranscriptWriter("blake2b")
    shplonk_open(params, tw, pqs)
    proof = tw.finalize()
    assert len(proof) == 64  # two G1 points

    tr = TranscriptReader(proof, "blake2b")
    vqs = [VerifierQuery(q.name, c[q.name], q.point, evals[(q.name, q.point % R)]) for q in pqs]
    assert shplonk_verify(params, tr, vqs)

    # corrupting an eval must fail
    tr2 = TranscriptReader(proof, "blake2b")
    bad = [
        VerifierQuery(q.name, c[q.name], q.point, (evals[(q.name, q.point % R)] + 1) % R)
        if i == 0
        else VerifierQuery(q.name, c[q.name], q.point, evals[(q.name, q.point % R)])
        for i, q in enumerate(pqs)
    ]
    assert not shplonk_verify(params, tr2, bad)
