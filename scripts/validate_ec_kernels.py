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
from zkdcap_tpu.curves.ec_kernels import (
    ec_madd_scan_full,
    ec_madd_scan_lm,
    ec_window_join,
)

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


def check_madd_full():
    """Whole-scan kernel vs a host-simulated segmented scan (random streams
    + forced doubling/cancellation/identity edges on the first lanes)."""
    M, B = 8, 256
    streams = [[rand_points(1)[0] for _ in range(M)] for _ in range(B)]
    sames = [[RNG.randrange(2) for _ in range(M)] for _ in range(B)]
    valids = [[RNG.randrange(4) > 0 for _ in range(M)] for _ in range(B)]
    negs = [[RNG.randrange(2) for _ in range(M)] for _ in range(B)]
    # lane 0: a pure doubling ladder; lane 1: immediate cancellation (via
    # the kernel-side negation of the same point)
    g = BN254_G1.g
    streams[0] = [g] * M
    sames[0] = [1] * M
    valids[0] = [True] * M
    negs[0] = [0] * M
    streams[1] = [g, g] + streams[1][2:]
    sames[1] = [1, 1] + sames[1][2:]
    valids[1] = [True, True] + valids[1][2:]
    negs[1] = [0, 1] + negs[1][2:]

    expect = []
    for b in range(B):
        acc = None
        lane_exp = []
        for m in range(M):
            q, s, v = streams[b][m], sames[b][m], valids[b][m]
            if negs[b][m]:
                q = BN254_G1.neg_pt(q)
            if v:
                acc = BN254_G1.add(acc, q) if s else q
            else:
                acc = acc if s else None
            lane_exp.append(acc)
        expect.append(lane_exp)

    import numpy as np

    from zkdcap_tpu.curves.ec_kernels import pack_affine_rows

    enc = np.stack(
        [np.asarray(encode_points(G1_SPEC, streams[b])) for b in range(B)]
    )  # (B, M, 2, L)
    L = enc.shape[-1]
    packed = np.asarray(pack_affine_rows(jnp.asarray(enc.reshape(B * M, 2, L))))
    Pm = jnp.asarray(packed.reshape(B, M, L).transpose(1, 2, 0))  # (M, L, B)
    masks = jnp.stack(
        [
            jnp.asarray(np.asarray(sames, np.uint32).T),
            jnp.asarray(np.asarray(valids, np.uint32).T),
            jnp.asarray(np.asarray(negs, np.uint32).T),
        ],
        axis=1,
    )  # (M, 3, B)
    oX, oY, oZ = ec_madd_scan_full(G1_SPEC, Pm, masks)
    got = decode_points(
        G1_SPEC,
        tuple(np.asarray(o).transpose(0, 2, 1).reshape(M * B, -1) for o in (oX, oY, oZ)),
    )
    want = [expect[b][m] for m in range(M) for b in range(B)]
    assert got == want, "ec_madd_scan_full mismatch"
    print(f"ec_madd_scan_full: OK ({M}x{B} random streams + edge lanes)")


def check_msm_packed_integration():
    """Differential MSM through the packed TPU path with a multi-step scan
    (M = N/lanes = 8): exercises sort_part's packed gather, the 3-row mask
    plumbing, and run-end compaction against a host oracle. Scalars are
    mostly 40-bit (cheap oracle) plus full-width/zero/n-1 edges."""
    import jax.numpy as jnp
    import numpy as np

    from zkdcap_tpu.fields import BN254_FR, mont
    from zkdcap_tpu.msm.pippenger import msm_device

    N, lanes = 4096, 512
    pts = rand_points(N)
    pts[7] = None  # an encoded infinity in the stream
    scalars = [RNG.randrange(1 << 40) for _ in range(N)]
    scalars[0] = 0
    scalars[1] = BN254_G1.n - 1
    scalars[2] = 1
    for i in range(3, 16):
        scalars[i] = RNG.randrange(BN254_G1.n)
    expect = None
    for k, p in zip(scalars, pts):
        if p is None or k == 0:
            continue
        expect = BN254_G1.add(expect, BN254_G1.mul(k, p))
    dpts = encode_points(G1_SPEC, pts)
    dscal = mont.from_mont(
        BN254_FR, mont.encode_ints(BN254_FR, scalars)
    )
    out = msm_device(G1_SPEC, dpts, dscal, lanes)
    got = decode_points(G1_SPEC, tuple(np.asarray(c)[None] for c in out))[0]
    assert got == expect, "packed msm_device mismatch vs host oracle"
    print(f"msm_device packed path: OK (N={N}, lanes={lanes}, M={N//lanes})")


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
    check_madd_full()
    check_window_join()
    check_msm_packed_integration()
    print("all EC kernel checks passed")
