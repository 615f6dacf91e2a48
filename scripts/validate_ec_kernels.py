#!/usr/bin/env python
"""TPU-side validation of the fused EC pallas kernels.

These kernels are TPU-only hot paths (the CPU test suite exercises the jnp
fallbacks); interpret mode is impractically slow for 30k-op kernel bodies,
so their unit checks live here and run on the real chip:

    python scripts/validate_ec_kernels.py

Checks: ec_madd_scan_lm select semantics + mixed-add completeness edges
(acc = identity / acc = Q / acc = -Q), and ec_window_join against a host
scalar-mul oracle. Exits nonzero on mismatch.
"""

import random
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from zkdcap_tpu.curves import BN254_G1
from zkdcap_tpu.curves.device_g1 import (
    G1_SPEC,
    affine_to_projective,
    decode_points,
    encode_points,
)
from zkdcap_tpu.curves.ec_kernels import ec_madd_scan_lm, ec_window_join

RNG = random.Random(7)


def rand_points(n):
    return [BN254_G1.mul(RNG.randrange(1, BN254_G1.n), BN254_G1.g) for _ in range(n)]


def check_madd():
    M = 128
    ps = rand_points(5)
    g = BN254_G1.g
    cases = []  # (acc, q, same, valid, expect)
    cases.append((ps[0], ps[1], 1, 1, BN254_G1.add(ps[0], ps[1])))
    cases.append((None, ps[1], 1, 1, ps[1]))  # acc = identity
    cases.append((ps[2], ps[2], 1, 1, BN254_G1.mul(2, ps[2])))  # doubling
    cases.append((ps[3], BN254_G1.neg_pt(ps[3]), 1, 1, None))  # cancellation
    cases.append((ps[4], ps[0], 0, 1, ps[0]))  # run restart -> Q
    cases.append((ps[4], ps[0], 1, 0, ps[4]))  # invalid, same run -> acc
    cases.append((ps[4], ps[0], 0, 0, None))  # invalid, restart -> identity
    while len(cases) < M:
        cases.append((g, g, 1, 1, BN254_G1.mul(2, g)))

    acc = affine_to_projective(G1_SPEC, encode_points(G1_SPEC, [c[0] for c in cases]))
    qenc = encode_points(G1_SPEC, [c[1] for c in cases])
    accT = tuple(c.T for c in acc)
    Q = (qenc[:, 0].T, qenc[:, 1].T)
    mask2 = jnp.stack(
        [
            jnp.asarray([c[2] for c in cases], jnp.uint32),
            jnp.asarray([c[3] for c in cases], jnp.uint32),
        ]
    )
    out = ec_madd_scan_lm(G1_SPEC, accT, Q, mask2)
    got = decode_points(G1_SPEC, tuple(c.T for c in out))
    expect = [c[4] for c in cases]
    assert got == expect, "ec_madd_scan_lm mismatch"
    print("ec_madd_scan_lm: OK (all select cases + completeness edges)")


def check_window_join():
    for c, W in ((5, 6), (13, 20)):
        ks = [RNG.randrange(0, 1 << (c - 1)) for _ in range(W)]
        ks[1] = 0  # an identity window
        pts = [BN254_G1.mul(k, BN254_G1.g) if k else None for k in ks]
        T = affine_to_projective(G1_SPEC, encode_points(G1_SPEC, pts))
        got = ec_window_join(G1_SPEC, T, c)
        expect = BN254_G1.mul(
            sum(k << (c * w) for w, k in enumerate(ks)) % BN254_G1.n, BN254_G1.g
        )
        dec = decode_points(G1_SPEC, tuple(x[None] for x in got))
        assert dec == [expect], f"ec_window_join mismatch at c={c} W={W}"
    print("ec_window_join: OK (c=5/W=6 and c=13/W=20 vs host oracle)")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    check_madd()
    check_window_join()
    print("all EC kernel checks passed")
