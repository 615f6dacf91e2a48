"""NTT differential tests vs naive host DFT (python bigints)."""

import random

import pytest

from zkdcap_tpu.fields import BN254_FR, mont
from zkdcap_tpu.ntt import Domain, intt, ntt

RNG = random.Random(7)
P = BN254_FR.p


def naive_dft(coeffs, w, p):
    n = len(coeffs)
    return [sum(coeffs[j] * pow(w, i * j, p) for j in range(n)) % p for i in range(n)]


@pytest.mark.parametrize("log_n", [1, 3, 5])
def test_ntt_matches_naive(log_n):
    n = 1 << log_n
    coeffs = [RNG.randrange(P) for _ in range(n)]
    w = BN254_FR.nth_root_of_unity(log_n)
    expect = naive_dft(coeffs, w, P)
    got = mont.decode_ints(BN254_FR, ntt(BN254_FR, mont.encode_ints(BN254_FR, coeffs)))
    assert got == expect


@pytest.mark.parametrize("log_n", [4, 8])
def test_roundtrip(log_n):
    n = 1 << log_n
    coeffs = [RNG.randrange(P) for _ in range(n)]
    x = mont.encode_ints(BN254_FR, coeffs)
    back = mont.decode_ints(BN254_FR, intt(BN254_FR, ntt(BN254_FR, x)))
    assert back == coeffs


@pytest.mark.slow
@pytest.mark.parametrize("log_n", [12, 13])  # even (6/6) and odd (6/7) splits
def test_four_step_matches_flat_and_roundtrips(log_n):
    """The two-pass four-step path (in-VMEM bit-reversal prologue + fused
    inter-pass twiddle epilogue) vs the flat radix-2 path, exact; plus an
    inverse roundtrip. Runs the pallas kernels in interpret mode on CPU —
    the same code Mosaic compiles on TPU."""
    from zkdcap_tpu.ntt.ntt import _ntt_impl, ntt_four_step, twiddle_table

    n = 1 << log_n
    coeffs = [RNG.randrange(P) for _ in range(n)]
    x = mont.encode_ints(BN254_FR, coeffs)
    got = mont.decode_ints(BN254_FR, ntt_four_step(BN254_FR, x, False))
    exp = mont.decode_ints(
        BN254_FR,
        _ntt_impl(BN254_FR, x, twiddle_table(BN254_FR, log_n, False), log_n, False),
    )
    assert got == exp
    back = mont.decode_ints(
        BN254_FR, ntt_four_step(BN254_FR, ntt_four_step(BN254_FR, x, False), True)
    )
    assert back == coeffs


def test_extended_coset():
    k, ek = 3, 5
    d = Domain(BN254_FR, k, ek)
    coeffs = [RNG.randrange(P) for _ in range(1 << k)]
    x = mont.encode_ints(BN254_FR, coeffs)
    ext = mont.decode_ints(BN254_FR, d.coeff_to_extended(x))
    # direct evaluation at g * w_ext^i
    for i in [0, 1, 5, 31]:
        pt = d.g_coset * pow(d.extended_omega, i, P) % P
        expect = sum(c * pow(pt, j, P) for j, c in enumerate(coeffs)) % P
        assert ext[i] == expect
    # roundtrip
    back = mont.decode_ints(BN254_FR, d.extended_to_coeff(d.coeff_to_extended(x)))
    assert back == coeffs + [0] * ((1 << ek) - (1 << k))


def test_cg_schedule_matches_reference_ntt():
    """The constant-geometry pass schedule (grouped deferred-DIF stages +
    rho^g interleaves + final bit-permutation, pallas_mont._cg_schedule) is
    validated against a direct NTT over a small prime field — the TPU
    kernel is a mechanical transcription of this exact dataflow."""
    import numpy as np

    from zkdcap_tpu.fields.pallas_mont import _cg_groups, _cg_schedule

    p = 12289
    for S in (8, 9, 10, 11):
        n = 1 << S
        w = pow(11, (p - 1) // n, p)
        assert pow(w, n // 2, p) != 1
        rng = np.random.default_rng(S)
        a = [int(v) for v in rng.integers(0, p, n)]
        groups, tables, swaps = _cg_schedule(S)
        assert sum(groups) == S and max(groups) <= max(S - 7, 1)
        x = np.array(a, dtype=object)
        ti = 0
        for gi, g in enumerate(groups):
            for k in range(g):
                m = 1 << (S - 1 - k)
                X = x.reshape(n // (2 * m), 2, m)
                lo = X[:, 0, :].reshape(-1)
                hi = X[:, 1, :].reshape(-1)
                s_ = (lo + hi) % p
                tw = np.array(
                    [pow(w, int(e), p) for e in tables[ti]], dtype=object
                )
                t_ = ((lo - hi) * tw) % p
                x = np.stack(
                    [s_.reshape(-1, m), t_.reshape(-1, m)], axis=1
                ).reshape(n)
                ti += 1
            if gi != len(groups) - 1:
                x = x.reshape(1 << g, n >> g).T.reshape(n)
        for a_, b_ in swaps:
            idx = np.arange(n)
            ba, bb = (idx >> a_) & 1, (idx >> b_) & 1
            tau = (idx & ~((1 << a_) | (1 << b_))) | (ba << b_) | (bb << a_)
            x = x[tau]
        ws = [pow(w, k2, p) for k2 in range(n)]
        ref = [
            sum(a[j] * ws[(j * k2) % n] for j in range(n)) % p
            for k2 in range(n)
        ]
        assert list(x) == ref, f"CG schedule mismatch at S={S}"
