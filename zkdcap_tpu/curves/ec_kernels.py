"""Pallas TPU kernel: fused complete EC addition with per-lane select.

The MSM's segmented lane scan and Hillis–Steele combine are sequences of
complete EC additions; expressed in jnp, every Montgomery multiply's
lax.scan materialises its 16 rounds through HBM (~450 MB of traffic per
G-wide EC add). This kernel runs the whole RCB'15 complete addition — 12
CIOS multiplies, all adds/subs, and the final per-lane select — inside one
VMEM-resident pass (limb-major (16, B) blocks), cutting the traffic to the
operands themselves (~50x).

select semantics (static `fallback`):
  out = mask ? (P ⊕ Q) : Q      (fallback="q",  the scan-step recurrence)
  out = mask ? (P ⊕ Q) : P      (fallback="p",  the Hillis-Steele level)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..fields.params import LIMB_BITS, LIMB_MASK, NUM_LIMBS, FieldParams
from .device_g1 import CurveSpec

L = NUM_LIMBS
W = LIMB_BITS
MASK = LIMB_MASK
BLOCK = 512


def _field_ops(p_limbs, n0inv):
    def cios(a, b):
        zero = jnp.zeros_like(a[0])
        t = [zero] * L
        for i in range(L):
            prod = [a[i] * b[j] for j in range(L)]
            plos = [pr & MASK for pr in prod]
            phis = [pr >> W for pr in prod]
            u0 = t[0] + plos[0]
            m = (u0 * n0inv) & MASK
            q = [m * pj for pj in p_limbs]
            qlo = [qq & MASK for qq in q]
            qhi = [qq >> W for qq in q]
            c0 = (u0 + qlo[0]) >> W
            nt = []
            for j in range(L):
                v = phis[j] + qhi[j]
                if j + 1 < L:
                    v = v + t[j + 1] + plos[j + 1] + qlo[j + 1]
                nt.append(v)
            nt[0] = nt[0] + c0
            t = nt
        out = []
        c = jnp.zeros_like(t[0])
        for j in range(L):
            v = t[j] + c
            out.append(v & MASK)
            c = v >> W
        return cond_sub(out, c)

    def cond_sub(limbs, overflow):
        d = []
        bw = jnp.zeros_like(limbs[0])
        for j in range(L):
            v = limbs[j] - p_limbs[j] - bw
            d.append(v & MASK)
            bw = (v >> W) & 1
        need = jnp.logical_or(overflow > 0, bw == 0)
        return [jnp.where(need, x, y) for x, y in zip(d, limbs)]

    def fadd(a, b):
        s = []
        c = jnp.zeros_like(a[0])
        for j in range(L):
            v = a[j] + b[j] + c
            s.append(v & MASK)
            c = v >> W
        return cond_sub(s, c)

    def fsub(a, b):
        d = []
        bw = jnp.zeros_like(a[0])
        for j in range(L):
            v = a[j] - b[j] - bw
            d.append(v & MASK)
            bw = (v >> W) & 1
        dp = []
        c = jnp.zeros_like(a[0])
        for j in range(L):
            v = d[j] + p_limbs[j] + c
            dp.append(v & MASK)
            c = v >> W
        neg = bw > 0
        return [jnp.where(neg, x, y) for x, y in zip(dp, d)]

    return cios, fadd, fsub


def _mk_ec_add_kernel(spec: CurveSpec, fallback: str):
    params: FieldParams = spec.field
    p_limbs = [int(v) for v in params.p_limbs]
    n0inv = params.n0inv
    from ..fields.params import R as RADIX

    b3m = spec.b3 * RADIX % params.p
    b3 = [(b3m >> (W * i)) & MASK for i in range(L)]

    def kernel(x1r, y1r, z1r, x2r, y2r, z2r, mr, ox, oy, oz):
        # block shape (L, SUB, 128): each limb slice is a full (SUB, 128)
        # VPU tile stack — a flat (1, B) row would drive only 1 of 8
        # sublanes (the round-1 kernels' main inefficiency)
        mul, fadd, fsub = _field_ops(p_limbs, n0inv)
        X1 = [x1r[i] for i in range(L)]
        Y1 = [y1r[i] for i in range(L)]
        Z1 = [z1r[i] for i in range(L)]
        X2 = [x2r[i] for i in range(L)]
        Y2 = [y2r[i] for i in range(L)]
        Z2 = [z2r[i] for i in range(L)]
        b3v = [jnp.full_like(X1[0], c) for c in b3]

        t0 = mul(X1, X2)
        t1 = mul(Y1, Y2)
        t2 = mul(Z1, Z2)
        t3 = fsub(mul(fadd(X1, Y1), fadd(X2, Y2)), fadd(t0, t1))
        t4 = fsub(mul(fadd(Y1, Z1), fadd(Y2, Z2)), fadd(t1, t2))
        t5 = fsub(mul(fadd(X1, Z1), fadd(X2, Z2)), fadd(t0, t2))
        t0 = fadd(fadd(t0, t0), t0)
        t2 = mul(b3v, t2)
        Z3 = fadd(t1, t2)
        t1 = fsub(t1, t2)
        Y3 = mul(b3v, t5)
        X3 = fsub(mul(t3, t1), mul(t4, Y3))
        Y3 = fadd(mul(t1, Z3), mul(Y3, t0))
        Z3 = fadd(mul(Z3, t4), mul(t0, t3))

        mask = mr[0] > 0
        FB = (X2, Y2, Z2) if fallback == "q" else (X1, Y1, Z1)
        for i in range(L):
            ox[i] = jnp.where(mask, X3[i], FB[0][i])
            oy[i] = jnp.where(mask, Y3[i], FB[1][i])
            oz[i] = jnp.where(mask, Z3[i], FB[2][i])

    return kernel


LANE = 128
MAX_SUB = 64  # rows per grid step: block (L, 64, 128) = 512 KiB x 10 refs


def _fold_sub(m_cols: int) -> int:
    """Largest SUB <= MAX_SUB with SUB*LANE dividing m_cols."""
    rows = m_cols // LANE
    sub = MAX_SUB
    while sub > 1 and rows % sub:
        sub //= 2
    return sub


@functools.cache
def _ec_add_call(spec: CurveSpec, fallback: str, m_cols: int, interpret: bool):
    kernel = _mk_ec_add_kernel(spec, fallback)
    sub = _fold_sub(m_cols)
    rows = m_cols // LANE
    grid = (rows // sub,)
    spec_c = pl.BlockSpec((L, sub, LANE), lambda i: (0, i, 0))
    spec_m = pl.BlockSpec((1, sub, LANE), lambda i: (0, i, 0))
    return pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, rows, LANE), jnp.uint32) for _ in range(3)
        ),
        grid=grid,
        in_specs=[spec_c] * 6 + [spec_m],
        out_specs=(spec_c, spec_c, spec_c),
        interpret=interpret,
    )


def ec_add_select_lm(spec: CurveSpec, P, Q, mask, fallback: str):
    """Limb-major fused op: P, Q are 3-tuples of (L, M) arrays; mask (1, M)
    uint32. Returns mask ? P⊕Q : fallback. M must be a multiple of 128."""
    interpret = jax.default_backend() != "tpu"
    m_cols = P[0].shape[1]
    rows = m_cols // LANE
    call = _ec_add_call(spec, fallback, m_cols, interpret)

    def fold(a):
        return a.reshape(a.shape[0], rows, LANE)

    out = call(*(fold(c) for c in P), *(fold(c) for c in Q), fold(mask))
    return tuple(c.reshape(L, m_cols) for c in out)


def ec_add_select(spec: CurveSpec, P, Q, mask, fallback: str):
    """Row-major wrapper: P, Q 3-tuples of (M, L); mask (M,) bool/int.

    Falls back to the jnp complete-add path off-TPU or for unaligned M."""
    M = P[0].shape[0]
    if M % LANE or jax.default_backend() != "tpu":
        from .device_g1 import ec_add, ec_select

        s = ec_add(spec, P, Q)
        fb = Q if fallback == "q" else P
        return ec_select(mask > 0 if mask.dtype != jnp.bool_ else mask, s, fb)
    Pt = tuple(c.T for c in P)
    Qt = tuple(c.T for c in Q)
    m2 = mask.astype(jnp.uint32)[None, :]
    out = ec_add_select_lm(spec, Pt, Qt, m2, fallback)
    return tuple(c.T for c in out)
