"""Redundant 12-bit-limb field arithmetic for Pallas kernel interiors.

The 16x16-bit lazy-carry CIOS (pallas_mont/ec_kernels) spends ~40% of its
u32 ops splitting every 32-bit partial product into lo/hi halves because
16-bit digit products have zero headroom. With 12-bit digits (22 limbs,
radix 2^12) a u32 accumulates a full column of partial products directly:
per Montgomery iteration the inner loop is mul+add only — ~2.0k u32 ops
per field mul vs ~2.7k — and scripts/vpu_calibrate2.py measured u32 mul
throughput == add throughput on v5e, so total-op count is the whole cost.

Montgomery subtlety: 22 iterations of radix-2^12 REDC divide by 2^264, not
the representation's R = 2^256. Kernels that multiply by a PRECOMPUTED
table operand (NTT twiddles) absorb the factor by scaling the table once:
    table' = w * 2^264 mod p      (host-side, see scale_mont_factor)
so cios12(x*R, table') = x*w*R mod p exactly. Values stay lazy (< ~3p,
digits canonical 12-bit after each propagate); only kernel exit does the
full reduction to < p, so results are bit-identical to the 16x16 path.

All helpers here build PYTHON op lists over jnp arrays for inlining into
Mosaic kernel bodies (same style as ec_kernels._field_ops).
"""

from __future__ import annotations

import jax.numpy as jnp

from .params import FieldParams

L12 = 22
W12 = 12
MASK12 = 0xFFF


def p12_limbs(p: int) -> list[int]:
    return [(p >> (W12 * i)) & MASK12 for i in range(L12)]


def n0inv12(p: int) -> int:
    """-p^-1 mod 2^12 (the radix-2^12 Montgomery constant)."""
    return (-pow(p, -1, 1 << W12)) % (1 << W12)


def scale_mont_factor(params: FieldParams) -> int:
    """Multiply a Montgomery-form table entry by this (mod p) before
    12-bit repacking so cios12's 2^-264 lands back on R = 2^256."""
    return (1 << (W12 * L12 - 256)) % params.p  # 2^8


def int_to_limbs12(v: int) -> list[int]:
    return [(v >> (W12 * i)) & MASK12 for i in range(L12)]


def unpack16(x16):
    """16 u32 16-bit-digit planes -> 22 canonical 12-bit-digit planes."""
    out = []
    for k in range(L12):
        bit = W12 * k
        j, r = bit // 16, bit % 16
        v = x16[j] >> r
        if r + W12 > 16 and j + 1 < 16:
            v = v | (x16[j + 1] << (16 - r))
        out.append(v & jnp.uint32(MASK12))
    return out


def pack16(x12):
    """22 canonical 12-bit-digit planes (value < 2^256) -> 16 u32 16-bit
    planes. Digits must be < 2^12 (run propagate first)."""
    out = []
    for j in range(16):
        bit = 16 * j
        k, r = bit // W12, bit % W12
        v = x12[k] >> r
        if k + 1 < L12:
            v = v | (x12[k + 1] << (W12 - r))
        if r + 16 > 2 * W12 and k + 2 < L12:
            v = v | (x12[k + 2] << (2 * W12 - r))
        out.append(v & jnp.uint32(0xFFFF))
    return out


def propagate(t):
    """Carry-propagate non-negative lazy digits to canonical < 2^12.
    Value must be < 2^264 (top carry is dropped)."""
    out = []
    c = jnp.zeros_like(t[0])
    for j in range(L12):
        v = t[j] + c
        out.append(v & jnp.uint32(MASK12))
        c = v >> W12
    return out


def propagate_signed(t_i32):
    """Carry-propagate int32 digits (possibly negative) of a NON-NEGATIVE
    total value; returns canonical uint32 digits < 2^12."""
    out = []
    c = jnp.zeros_like(t_i32[0])
    for j in range(L12):
        v = t_i32[j] + c
        out.append((v & jnp.int32(MASK12)).astype(jnp.uint32))
        c = v >> W12  # arithmetic shift: floor division by 2^12
    return out


def n0inv4(p: int) -> int:
    return (-pow(p, -1, 1 << 4)) % (1 << 4)


def make_cios256(params: FieldParams):
    """Montgomery mul removing EXACTLY 2^256 with both operands dynamic
    (no pre-scaled table): 21 radix-2^12 iterations + one radix-2^4
    iteration + a 4-bit digit-wise shift. Operand values must be < 2^256
    (= ~5.29p; the 21x12+4-bit digit decomposition requirement), digits
    canonical < 2^12 (top digit < 2^4 is implied by value < 2^256 only
    after a canonical propagate — callers keep digits canonical).
    Output: canonical digits, value <= p + a*b/2^256."""
    p = params.p
    p12 = p12_limbs(p)
    n0_12 = n0inv12(p)
    n0_4 = n0inv4(p)

    def cios256(a, b):
        zero = jnp.zeros_like(a[0])
        t = [zero] * L12
        for i in range(L12 - 1):
            ai = a[i]
            t = [t[j] + ai * b[j] for j in range(L12)]
            m = (t[0] * jnp.uint32(n0_12)) & jnp.uint32(MASK12)
            t = [t[j] + m * jnp.uint32(p12[j]) for j in range(L12)]
            carry = t[0] >> W12
            t = t[1:] + [zero]
            t[0] = t[0] + carry
        # final radix-2^4 iteration: digit a[21] = bits [252, 256)
        ai = a[L12 - 1]
        t = [t[j] + ai * b[j] for j in range(L12)]
        m = (t[0] * jnp.uint32(n0_4)) & jnp.uint32(0xF)
        t = [t[j] + m * jnp.uint32(p12[j]) for j in range(L12)]
        out = propagate(t)  # value divisible by 2^4 (mod-16 cancellation)
        shifted = [
            (out[j] >> 4) | ((out[j + 1] & jnp.uint32(0xF)) << 8)
            for j in range(L12 - 1)
        ] + [out[L12 - 1] >> 4]
        return shifted

    return cios256


def mul_small(x, c: int):
    """x * c for a small positive constant c (c * 2^12 < 2^32): digitwise
    multiply + propagate. Output digits canonical; value = c * value(x)
    (callers csub back down — e.g. BN254's b3 = 9 costs ~0.2 of a cios)."""
    return propagate([v * jnp.uint32(c) for v in x])


def make_ops(params: FieldParams):
    """Returns (cios12, csub, add_lazy, sub_lazy) closures for a kernel.

    cios12(a, b): a = 22 digit planes (canonical digits, value may be
      multi-p), b = 22 CANONICAL digit planes of a table operand already
      scaled by scale_mont_factor. Output: canonical digits, value
      <= p + a*b/2^264 (REDC bound): with b < p this is
      <= p*(1 + 0.00074*(a/p)), i.e. ~1.003p for any lazy a < 4p — each
      stage's table mul collapses the lazy growth, so NTT stage values
      stay < 3.01p (plus < 2.01p, minus < part + 2p) and the exit's
      csub(csub(x,2),1) canonicalises anything < 4p.
    csub(x, k): subtract k*p once if x >= k*p (canonical digits in/out).
    add_lazy(a, b): digitwise add, then propagate (values < 2^263 each).
    sub_lazy(a, b, slack_p): a - b + slack_p*p via signed digits (requires
      b < slack_p * p); output canonical digits, value < a_bound + slack.
    """
    p = params.p
    p12 = p12_limbs(p)
    n0 = n0inv12(p)

    def cios12(a, b):
        zero = jnp.zeros_like(a[0])
        n0v = jnp.uint32(n0)
        t = [zero] * L12
        for i in range(L12):
            ai = a[i]
            t = [t[j] + ai * b[j] for j in range(L12)]
            m = (t[0] * n0v) & jnp.uint32(MASK12)
            t = [t[j] + m * jnp.uint32(p12[j]) for j in range(L12)]
            carry = t[0] >> W12
            t = t[1:] + [zero]
            t[0] = t[0] + carry
        return propagate(t)

    def csub(x, k: int):
        kp = int_to_limbs12(k * p)
        xi = [v.astype(jnp.int32) for v in x]
        d = [xi[j] - jnp.int32(kp[j]) for j in range(L12)]
        # propagate with sign to learn the final borrow
        out = []
        c = jnp.zeros_like(d[0])
        for j in range(L12):
            v = d[j] + c
            out.append(v & jnp.int32(MASK12))
            c = v >> W12
        neg = c < 0
        return [
            jnp.where(neg, a_, b_.astype(jnp.uint32))
            for a_, b_ in zip(x, out)
        ]

    def add_lazy(a, b):
        return propagate([x + y for x, y in zip(a, b)])

    def sub_lazy(a, b, slack_p: int):
        sp = int_to_limbs12(slack_p * p)
        d = [
            a[j].astype(jnp.int32) + jnp.int32(sp[j]) - b[j].astype(jnp.int32)
            for j in range(L12)
        ]
        return propagate_signed(d)

    return cios12, csub, add_lazy, sub_lazy
