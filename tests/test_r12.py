"""Redundant 12-bit-limb field ops (fields/r12.py) vs python bigints.

The r12 kernels themselves are TPU-only (interpret-mode compiles of the
22-limb unrolled bodies are impractical — see ntt._use_r12); this covers
the arithmetic building blocks the kernels inline, on the CPU backend.
On-chip end-to-end checks: scripts/validate_ec_kernels.py (r12 scan
kernel edge cases) and the golden-proof byte-identity of TPU proofs.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkdcap_tpu.fields import BN254_FR
from zkdcap_tpu.fields import r12

P = BN254_FR.p
RNG = random.Random(11)
NB = 16


def to12(vals):
    return [
        jnp.asarray([(v >> (r12.W12 * i)) & r12.MASK12 for v in vals], jnp.uint32)
        for i in range(r12.L12)
    ]


def from12(planes):
    cols = np.stack([np.asarray(x) for x in planes])
    return [
        sum(int(cols[i, k]) << (r12.W12 * i) for i in range(r12.L12))
        for k in range(cols.shape[1])
    ]


def test_pack_unpack_roundtrip():
    v = [RNG.randrange(1 << 256) for _ in range(NB)]
    x16 = [
        jnp.asarray([(w >> (16 * i)) & 0xFFFF for w in v], jnp.uint32)
        for i in range(16)
    ]
    x12 = jax.jit(r12.unpack16)(x16)
    assert from12(x12) == v
    back = jax.jit(r12.pack16)([jnp.asarray(np.asarray(t)) for t in x12])
    vb = [
        sum(int(np.asarray(x)[k]) << (16 * i) for i, x in enumerate(back))
        for k in range(NB)
    ]
    assert vb == v


def test_cios12_scaled_table_mul():
    """cios12 with a 2^8-prescaled table operand lands back on R = 2^256
    Montgomery form; lazy multi-p a-operands stay exact mod p and the
    output respects the documented < 1.003p-ish bound."""
    cios12, _, _, _ = r12.make_ops(BN254_FR)
    scale = r12.scale_mont_factor(BN254_FR)
    assert scale == (1 << 8) % P
    a = [RNG.randrange(4 * P) for _ in range(NB)]
    b = [RNG.randrange(P) for _ in range(NB)]
    bs = [v * scale % P for v in b]
    out = from12(jax.jit(cios12)(to12(a), to12(bs)))
    inv264 = pow(1 << 264, -1, P)
    for k in range(NB):
        assert out[k] % P == a[k] * b[k] * inv264 * (1 << 8) % P
        assert out[k] < P + (a[k] * b[k] >> 264) + 2


def test_cios256_dynamic_mul():
    """cios256 (21x radix-2^12 + 1x radix-2^4) removes exactly 2^256 with
    both operands dynamic — the EC-kernel multiply."""
    cios256 = r12.make_cios256(BN254_FR)
    inv256 = pow(1 << 256, -1, P)
    a = [RNG.randrange(1 << 256) for _ in range(NB)]
    b = [RNG.randrange(1 << 256) for _ in range(NB)]
    out = from12(jax.jit(cios256)(to12(a), to12(b)))
    for k in range(NB):
        assert out[k] % P == a[k] * b[k] * inv256 % P
        assert out[k] < P + (a[k] * b[k] >> 256) + 2


def test_csub_and_lazy_add_sub():
    _, csub, add_lazy, sub_lazy = r12.make_ops(BN254_FR)
    x = [RNG.randrange(3 * P) for _ in range(NB)]
    y2 = from12(jax.jit(lambda v: csub(v, 2))(to12(x)))
    assert y2 == [v - 2 * P if v >= 2 * P else v for v in x]
    xa = [RNG.randrange(2 * P) for _ in range(NB)]
    ya = [RNG.randrange(int(1.02 * P)) for _ in range(NB)]
    s = from12(jax.jit(add_lazy)(to12(xa), to12(ya)))
    d = from12(jax.jit(lambda u, v: sub_lazy(u, v, 2))(to12(xa), to12(ya)))
    assert s == [u + v for u, v in zip(xa, ya)]
    assert d == [u - v + 2 * P for u, v in zip(xa, ya)]


@pytest.mark.slow
@pytest.mark.parametrize("seed", [1, 2])
def test_rcb_mixed_add_r12_dataflow(seed):
    """The exact op/bound sequence of _mk_madd_scan_full_kernel_r12's
    interior, replayed with the r12 helpers on random curve points, vs the
    host curve oracle — proves the csub slack choices keep values exact
    mod p through the whole RCB'15 mixed add."""
    from zkdcap_tpu.curves import BN254_G1
    from zkdcap_tpu.curves.device_g1 import G1_SPEC
    from zkdcap_tpu.fields.params import R as RADIX

    # curve coordinates live in the BASE field Fq = G1_SPEC.field (NOT Fr)
    P = G1_SPEC.field.p
    rng = random.Random(seed)
    cios256 = r12.make_cios256(G1_SPEC.field)
    _, csub, add_lazy, sub_lazy = r12.make_ops(G1_SPEC.field)
    b3_12 = to12([G1_SPEC.b3 * RADIX % P] * NB)

    acc = [BN254_G1.mul(rng.randrange(1, BN254_G1.n), BN254_G1.g) for _ in range(NB)]
    q = [BN254_G1.mul(rng.randrange(1, BN254_G1.n), BN254_G1.g) for _ in range(NB)]
    # projective acc with a random non-1 Z (lazy multi-p coords via +P)
    zs = [rng.randrange(1, P) for _ in range(NB)]
    enc = lambda vals: to12([v * RADIX % P + (P if rng.random() < 0.5 else 0) for v in vals])
    X1 = enc([a[0] * z % P for a, z in zip(acc, zs)])
    Y1 = enc([a[1] * z % P for a, z in zip(acc, zs)])
    Z1 = enc(zs)
    X2 = to12([b[0] * RADIX % P for b in q])
    Y2 = to12([b[1] * RADIX % P for b in q])

    # one small jitted program per helper (shapes shared -> each compiles
    # once); a single fused jit of the whole madd is a 12k-op XLA:CPU
    # compile bomb (>20 min), while the TPU kernel compiles it fine
    mul = jax.jit(cios256)
    add_lazy = jax.jit(add_lazy)
    sub_lazy = jax.jit(sub_lazy, static_argnums=2)
    csub = jax.jit(csub, static_argnums=1)

    def madd(X1, Y1, Z1, X2, Y2):
        b3v = b3_12
        t0 = mul(X1, X2)
        t1 = mul(Y1, Y2)
        m_ab = mul(add_lazy(X1, Y1), add_lazy(X2, Y2))
        t3 = csub(sub_lazy(m_ab, add_lazy(t0, t1), 3), 2)
        t4 = add_lazy(Y1, mul(Y2, Z1))
        t5 = add_lazy(X1, mul(X2, Z1))
        t0 = add_lazy(add_lazy(t0, t0), t0)
        t2 = mul(b3v, Z1)
        Z3 = add_lazy(t1, t2)
        t1 = sub_lazy(t1, t2, 2)
        Y3 = mul(b3v, t5)
        mA = mul(t3, t1)
        mB = mul(t4, Y3)
        X3 = csub(csub(sub_lazy(mA, mB, 3), 2), 2)
        mC = mul(t1, Z3)
        mD = mul(Y3, t0)
        Y3 = csub(csub(add_lazy(mC, mD), 2), 2)
        mE = mul(Z3, t4)
        mF = mul(t0, t3)
        Z3 = csub(csub(csub(add_lazy(mE, mF), 2), 2), 1)
        return X3, Y3, Z3

    X3, Y3, Z3 = madd(X1, Y1, Z1, X2, Y2)
    xs, ys, zz = from12(X3), from12(Y3), from12(Z3)
    rinv = pow(RADIX, -1, P)
    for k in range(NB):
        want = BN254_G1.add(acc[k], q[k])
        zi = pow(zz[k] * rinv % P, -1, P)
        got = (xs[k] * rinv * zi % P, ys[k] * rinv * zi % P)
        assert got == want, k
        assert xs[k] < 2 * P and ys[k] < 2 * P and zz[k] < 2 * P, k
