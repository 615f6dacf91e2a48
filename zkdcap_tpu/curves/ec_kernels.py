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
import os as _os

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


def _mk_ec_madd_kernel(spec: CurveSpec):
    """Mixed-addition scan step: acc (projective) + Q (affine, Z2=1).

    Substituting Z2 = 1 into the RCB'15 complete a=0 addition keeps
    completeness for EVERY acc (including the identity and acc = ±Q) while
    dropping one multiply and four add/subs; Q's validity is handled by the
    select, so the affine stream needs no (0:1:0) encoding — and no Z plane
    at all (one fewer (M, L, B) stream in HBM).

    select semantics per lane (v = valid, s = same-run):
      v & s  -> acc ⊕ Q        v & !s -> (X2 : Y2 : 1)
      !v & s -> acc            !v & !s -> (0 : 1 : 0)
    """
    params: FieldParams = spec.field
    p_limbs = [int(v) for v in params.p_limbs]
    n0inv = params.n0inv
    from ..fields.params import R as RADIX

    b3m = spec.b3 * RADIX % params.p
    b3 = [(b3m >> (W * i)) & MASK for i in range(L)]
    onem = RADIX % params.p
    one_l = [(onem >> (W * i)) & MASK for i in range(L)]

    def kernel(x1r, y1r, z1r, x2r, y2r, mr, ox, oy, oz):
        mul, fadd, fsub = _field_ops(p_limbs, n0inv)
        X1 = [x1r[i] for i in range(L)]
        Y1 = [y1r[i] for i in range(L)]
        Z1 = [z1r[i] for i in range(L)]
        X2 = [x2r[i] for i in range(L)]
        Y2 = [y2r[i] for i in range(L)]
        b3v = [jnp.full_like(X1[0], c) for c in b3]
        onev = [jnp.full_like(X1[0], c) for c in one_l]
        zerov = [jnp.zeros_like(X1[0]) for _ in range(L)]

        t0 = mul(X1, X2)
        t1 = mul(Y1, Y2)
        t3 = fsub(mul(fadd(X1, Y1), fadd(X2, Y2)), fadd(t0, t1))
        t4 = fadd(Y1, mul(Y2, Z1))  # Y1*Z2 + Y2*Z1 with Z2 = 1
        t5 = fadd(X1, mul(X2, Z1))  # X1*Z2 + X2*Z1
        t0 = fadd(fadd(t0, t0), t0)
        t2 = mul(b3v, Z1)  # b3 * Z1*Z2
        Z3 = fadd(t1, t2)
        t1 = fsub(t1, t2)
        Y3 = mul(b3v, t5)
        X3 = fsub(mul(t3, t1), mul(t4, Y3))
        Y3 = fadd(mul(t1, Z3), mul(Y3, t0))
        Z3 = fadd(mul(Z3, t4), mul(t0, t3))

        same = mr[0] > 0
        valid = mr[1] > 0
        for i in range(L):
            # valid: same ? S : (X2:Y2:1); invalid: same ? acc : identity
            ox[i] = jnp.where(
                valid,
                jnp.where(same, X3[i], X2[i]),
                jnp.where(same, X1[i], zerov[i]),
            )
            oy[i] = jnp.where(
                valid,
                jnp.where(same, Y3[i], Y2[i]),
                jnp.where(same, Y1[i], onev[i]),
            )
            oz[i] = jnp.where(
                valid,
                jnp.where(same, Z3[i], onev[i]),
                jnp.where(same, Z1[i], zerov[i]),
            )

    return kernel


LANE = 128
MAX_SUB = 64  # rows per grid step: block (L, 64, 128) = 512 KiB x 10 refs


def _fold_sub(m_cols: int) -> int:
    """Block row count for a (L, rows, LANE) operand.

    Mosaic requires the block's second-to-last dim be divisible by 8 OR
    equal the full dim, so: whole array when rows <= MAX_SUB, else the
    largest power-of-two divisor in [8, MAX_SUB]. Returns 0 when no legal
    fold exists (callers fall back to the jnp path)."""
    rows = m_cols // LANE
    if rows <= MAX_SUB:
        return rows
    sub = MAX_SUB
    while sub >= 8 and rows % sub:
        sub //= 2
    return sub if sub >= 8 else 0


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


def _mk_window_join_kernel(spec: CurveSpec, window_bits: int, num_windows: int,
                           sub: int):
    """Fused Pippenger window join: R = sum_w 2^(c*w) T_w in ONE kernel.

    Input block (L, sub, 128) holds T_w at [:, w, 0] (identity elsewhere).
    Phase 1: 13*(W-1) masked parallel doublings — sublane w doubles while
    t < c*w, so U_w = 2^(c*w) T_w after the loop (each double is the RCB'15
    complete a=0 doubling, branch-free). Phase 2: circular roll-tree over
    the sub axis sums all sublanes (pad sublanes hold the identity).
    Replaces ~c*W sequential single-lane jnp doublings whose per-op latency
    dominated the aggregation tail (~250 ms -> ~20 ms at c=13, W=20).
    """
    params: FieldParams = spec.field
    p_limbs = [int(v) for v in params.p_limbs]
    n0inv = params.n0inv
    from jax.experimental.pallas import tpu as pltpu

    from ..fields.params import R as RADIX

    b3m = spec.b3 * RADIX % params.p
    b3 = [(b3m >> (W * i)) & MASK for i in range(L)]
    total_dbl = window_bits * (num_windows - 1)

    def kernel(xr, yr, zr, ox, oy, oz):
        mul, fadd, fsub = _field_ops(p_limbs, n0inv)
        b3v = [jnp.full((sub, LANE), c, jnp.uint32) for c in b3]
        subi = jax.lax.broadcasted_iota(jnp.int32, (sub, LANE), 0)

        def dbl(P):
            X, Y, Z = P
            t0 = mul(Y, Y)
            z3 = fadd(t0, t0)
            z3 = fadd(z3, z3)
            z3 = fadd(z3, z3)
            t1 = mul(Y, Z)
            t2 = mul(Z, Z)
            t2 = mul(b3v, t2)
            x3 = mul(t2, z3)
            y3 = fadd(t0, t2)
            z3 = mul(t1, z3)
            t1 = fadd(t2, t2)
            t2 = fadd(t1, t2)
            t0 = fsub(t0, t2)
            y3 = mul(t0, y3)
            y3 = fadd(x3, y3)
            t1 = mul(X, Y)
            x3 = mul(t0, t1)
            x3 = fadd(x3, x3)
            return x3, y3, z3

        def add(P, Q):
            X1, Y1, Z1 = P
            X2, Y2, Z2 = Q
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
            return X3, Y3, Z3

        P = (
            [xr[i] for i in range(L)],
            [yr[i] for i in range(L)],
            [zr[i] for i in range(L)],
        )

        def flat(P):
            return list(P[0]) + list(P[1]) + list(P[2])

        def unflat(v):
            return (v[:L], v[L : 2 * L], v[2 * L :])

        def dbl_step(t, Pf):
            P = unflat(Pf)
            D = dbl(P)
            keep = t < subi * window_bits
            out = [jnp.where(keep, d, p) for d, p in zip(flat(D), Pf)]
            return out

        Pf = jax.lax.fori_loop(0, total_dbl, dbl_step, flat(P))
        P = unflat(Pf)

        s = 1
        while s < sub:
            # circular left-shift by s == roll right by (sub - s)
            Q = tuple([pltpu.roll(c, sub - s, 0) for c in coord] for coord in P)
            P = add(P, Q)
            s *= 2

        for i in range(L):
            ox[i] = P[0][i]
            oy[i] = P[1][i]
            oz[i] = P[2][i]

    return kernel


@functools.cache
def _window_join_call(spec: CurveSpec, window_bits: int, num_windows: int,
                      sub: int, interpret: bool):
    kernel = _mk_window_join_kernel(spec, window_bits, num_windows, sub)
    spec_c = pl.BlockSpec((L, sub, LANE), lambda: (0, 0, 0))
    return pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, sub, LANE), jnp.uint32) for _ in range(3)
        ),
        in_specs=[spec_c] * 3,
        out_specs=(spec_c, spec_c, spec_c),
        interpret=interpret,
    )


def ec_window_join(spec: CurveSpec, T, window_bits: int):
    """Join per-window sums T (3-tuple of (W, L)) into sum_w 2^(c*w) T_w.

    Returns a single projective point as a 3-tuple of (L,) arrays."""
    num_windows = T[0].shape[0]
    sub = max(1 << (num_windows - 1).bit_length(), 8)
    interpret = jax.default_backend() != "tpu"
    from ..fields import mont

    one = mont.one_mont(spec.field, ())

    def place(arr, fill):
        # (W, L) -> (L, sub, LANE) with T_w at [:, w, 0], fill elsewhere
        blk = jnp.broadcast_to(fill[:, None, None], (L, sub, LANE))
        return blk.at[:, :num_windows, 0].set(arr.T)

    zero = jnp.zeros((L,), jnp.uint32)
    X = place(T[0], zero)
    Y = place(T[1], one)
    Z = place(T[2], zero)
    call = _window_join_call(spec, window_bits, num_windows, sub, interpret)
    oX, oY, oZ = call(X, Y, Z)
    return (oX[:, 0, 0], oY[:, 0, 0], oZ[:, 0, 0])


@functools.cache
def _ec_madd_call(spec: CurveSpec, m_cols: int, interpret: bool):
    kernel = _mk_ec_madd_kernel(spec)
    sub = _fold_sub(m_cols)
    rows = m_cols // LANE
    grid = (rows // sub,)
    spec_c = pl.BlockSpec((L, sub, LANE), lambda i: (0, i, 0))
    spec_m = pl.BlockSpec((2, sub, LANE), lambda i: (0, i, 0))
    return pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, rows, LANE), jnp.uint32) for _ in range(3)
        ),
        grid=grid,
        in_specs=[spec_c] * 5 + [spec_m],
        out_specs=(spec_c, spec_c, spec_c),
        interpret=interpret,
    )


def ec_madd_scan_lm(spec: CurveSpec, acc, Q, mask2):
    """Fused mixed-add scan step, limb-major: acc 3-tuple of (L, M)
    projective; Q 2-tuple of (L, M) affine Montgomery; mask2 (2, M) uint32
    rows [same-run; valid]. M must be a multiple of 128. See
    _mk_ec_madd_kernel for the per-lane select semantics."""
    interpret = jax.default_backend() != "tpu"
    m_cols = acc[0].shape[1]
    rows = m_cols // LANE
    call = _ec_madd_call(spec, m_cols, interpret)

    def fold(a):
        return a.reshape(a.shape[0], rows, LANE)

    out = call(*(fold(c) for c in acc), *(fold(c) for c in Q), fold(mask2))
    return tuple(c.reshape(L, m_cols) for c in out)


def _mk_madd_scan_full_kernel(spec: CurveSpec, sub: int):
    """Whole-scan mixed-add kernel: ALL M scan steps in one pallas_call.

    Grid is (lane_blocks, M_minor): the TPU grid runs sequentially with the
    last dimension minor, so for each lane block the kernel sees steps
    m = 0..M-1 in order while the accumulator lives in VMEM scratch — no
    HBM round-trip of the 3 accumulator planes between steps and no per-step
    kernel launch (the per-step fori_loop dispatch dominated the scan at
    ~2.7 ms/step vs ~0.2 ms of actual work; see BENCH.md round-2 budget).

    The affine stream arrives PACKED: plane j<8 holds X limbs (2j, 2j+1) as
    lo/hi u16 halves of one u32, planes 8..15 hold Y likewise — the upstream
    sorted-point gather is row-latency-bound, so halving row bytes nearly
    halves its cost (scripts/gather_experiment.py); the unpack is free VPU
    work here. Mask rows: [same-run; valid; negate-Y]. Select semantics per
    lane match _mk_ec_madd_kernel, with Y2 := neg ? -Y2 : Y2 first.
    """
    params: FieldParams = spec.field
    p_limbs = [int(v) for v in params.p_limbs]
    n0inv = params.n0inv
    from ..fields.params import R as RADIX

    b3m = spec.b3 * RADIX % params.p
    b3 = [(b3m >> (W * i)) & MASK for i in range(L)]
    onem = RADIX % params.p
    one_l = [(onem >> (W * i)) & MASK for i in range(L)]

    def kernel(pr, mr, ox, oy, oz, ax, ay, az):
        m_id = pl.program_id(1)

        @pl.when(m_id == 0)
        def _init():
            zero = jnp.zeros((sub, LANE), jnp.uint32)
            for i in range(L):
                ax[i] = zero
                ay[i] = jnp.full((sub, LANE), one_l[i], jnp.uint32)
                az[i] = zero

        mul, fadd, fsub = _field_ops(p_limbs, n0inv)
        X1 = [ax[i] for i in range(L)]
        Y1 = [ay[i] for i in range(L)]
        Z1 = [az[i] for i in range(L)]
        X2, Y2 = [], []
        for j in range(L // 2):
            v = pr[0, j]
            X2.append(v & jnp.uint32(0xFFFF))
            X2.append(v >> 16)
        for j in range(L // 2):
            v = pr[0, L // 2 + j]
            Y2.append(v & jnp.uint32(0xFFFF))
            Y2.append(v >> 16)
        b3v = [jnp.full_like(X1[0], c) for c in b3]
        onev = [jnp.full_like(X1[0], c) for c in one_l]
        zerov = [jnp.zeros_like(X1[0]) for _ in range(L)]

        neg = mr[0, 2] > 0
        Yn = fsub(zerov, Y2)
        Y2 = [jnp.where(neg, a, b) for a, b in zip(Yn, Y2)]

        t0 = mul(X1, X2)
        t1 = mul(Y1, Y2)
        t3 = fsub(mul(fadd(X1, Y1), fadd(X2, Y2)), fadd(t0, t1))
        t4 = fadd(Y1, mul(Y2, Z1))  # Y1*Z2 + Y2*Z1 with Z2 = 1
        t5 = fadd(X1, mul(X2, Z1))  # X1*Z2 + X2*Z1
        t0 = fadd(fadd(t0, t0), t0)
        t2 = mul(b3v, Z1)  # b3 * Z1*Z2
        Z3 = fadd(t1, t2)
        t1 = fsub(t1, t2)
        Y3 = mul(b3v, t5)
        X3 = fsub(mul(t3, t1), mul(t4, Y3))
        Y3 = fadd(mul(t1, Z3), mul(Y3, t0))
        Z3 = fadd(mul(Z3, t4), mul(t0, t3))

        same = mr[0, 0] > 0
        valid = mr[0, 1] > 0
        for i in range(L):
            nx = jnp.where(
                valid,
                jnp.where(same, X3[i], X2[i]),
                jnp.where(same, X1[i], zerov[i]),
            )
            ny = jnp.where(
                valid,
                jnp.where(same, Y3[i], Y2[i]),
                jnp.where(same, Y1[i], onev[i]),
            )
            nz = jnp.where(
                valid,
                jnp.where(same, Z3[i], onev[i]),
                jnp.where(same, Z1[i], zerov[i]),
            )
            ax[i] = nx
            ay[i] = ny
            az[i] = nz
            ox[0, i] = nx
            oy[0, i] = ny
            oz[0, i] = nz

    return kernel


def _mk_madd_scan_full_kernel_r12(spec: CurveSpec, sub: int):
    """Redundant 12-bit-limb variant of the whole-scan mixed-add kernel
    (fields/r12.py): the RCB'15 interior runs 22x12-bit digits through
    cios256 (~2.2k u32 ops/mul vs ~2.9k incl. the lo/hi product splits),
    with explicit 2p-reductions (csub) keeping every multiplier operand
    below the 2^256 digit-decomposition capacity (~5.29p). The
    accumulator lives in r12 scratch across all M steps; outputs are
    packed back to 16-bit planes with coordinates < 2p — downstream
    complete formulas and decode are representation-agnostic mod p, so
    MSM results (and proofs) are unchanged.

    Dataflow, select semantics and mask rows match
    _mk_madd_scan_full_kernel exactly.
    """
    params: FieldParams = spec.field
    from ..fields import r12 as r12m
    from ..fields.params import R as RADIX

    p = params.p
    L12 = r12m.L12
    b3_12 = r12m.int_to_limbs12(spec.b3 * RADIX % p)
    one_12 = r12m.int_to_limbs12(RADIX % p)
    cios256 = r12m.make_cios256(params)
    _, csub, add_lazy, sub_lazy = r12m.make_ops(params)
    # b3 = 9 for BN254: x*9 is a digitwise small mul + 4 csubs (~0.6k u32
    # ops) instead of a full cios (~2.2k) — and 9*Z stays Montgomery-form
    # (9*(Z*R) = (9Z)*R). Generic curves with a full-width b3 keep the mul.
    small_b3 = spec.b3 < (1 << 12)

    def kernel(pr, mr, ox, oy, oz, ax, ay, az):
        m_id = pl.program_id(1)

        @pl.when(m_id == 0)
        def _init():
            zero = jnp.zeros((sub, LANE), jnp.uint32)
            for i in range(L12):
                ax[i] = zero
                ay[i] = jnp.full((sub, LANE), one_12[i], jnp.uint32)
                az[i] = zero

        X1 = [ax[i] for i in range(L12)]
        Y1 = [ay[i] for i in range(L12)]
        Z1 = [az[i] for i in range(L12)]
        # u16-packed planes -> 16-bit digit planes -> 12-bit digit planes
        X16, Y16 = [], []
        for j in range(L // 2):
            v = pr[0, j]
            X16.append(v & jnp.uint32(0xFFFF))
            X16.append(v >> 16)
        for j in range(L // 2):
            v = pr[0, L // 2 + j]
            Y16.append(v & jnp.uint32(0xFFFF))
            Y16.append(v >> 16)
        X2 = r12m.unpack16(X16)  # canonical, < p
        Y2 = r12m.unpack16(Y16)
        b3v = [jnp.full_like(X2[0], c) for c in b3_12]
        onev = [jnp.full_like(X2[0], c) for c in one_12]
        zerov = [jnp.zeros_like(X2[0]) for _ in range(L12)]

        neg = mr[0, 2] > 0
        Yn = sub_lazy(zerov, Y2, 1)  # p - Y2, < p
        Y2 = [jnp.where(neg, a_, b_) for a_, b_ in zip(Yn, Y2)]

        # RCB'15 mixed add (Z2 = 1) with bound management: acc coords < 2p,
        # stream coords < p; csub wherever a value could otherwise approach
        # the 2^256 operand capacity (bounds in brackets; REDC bound
        # out <= p*(1 + ab/(5.29 p^2)) with 2^256 ~ 5.29p).
        mul = cios256

        def mul_b3(x, x_bound_p: int):
            # t = b3*x reduced below 2p. small path: digit mul + 4 csubs.
            if not small_b3:
                return mul(x, b3v)
            t = r12m.mul_small(x, int(spec.b3))
            k = 1 << max(x_bound_p * int(spec.b3) - 1, 1).bit_length() >> 1
            while k >= 2:
                t = csub(t, k)
                k >>= 1
            return t

        t0 = mul(X1, X2)                        # < 1.38p
        t1 = mul(Y1, Y2)                        # < 1.38p
        m_ab = mul(add_lazy(X1, Y1), add_lazy(X2, Y2))  # (4p)(2p) -> < 2.52p
        t3 = csub(sub_lazy(m_ab, add_lazy(t0, t1), 3), 2)  # < 3.52p
        t4 = add_lazy(Y1, mul(Y2, Z1))          # < 3.38p
        t5 = add_lazy(X1, mul(X2, Z1))          # < 3.38p
        t0 = add_lazy(add_lazy(t0, t0), t0)     # < 4.14p
        t2 = mul_b3(Z1, 2)                      # 9*Z1 < 18p -> csubs -> < 2p
        Z3 = add_lazy(t1, t2)                   # < 3.38p
        t1 = sub_lazy(t1, t2, 2)                # < 3.38p
        Y3 = mul_b3(t5, 4)                      # 9*t5 < 31p -> csubs -> < 2p
        mA = mul(t3, t1)                        # (3.52)(3.38) -> < 3.25p
        mB = mul(t4, Y3)                        # (3.38)(2) -> < 2.28p
        X3 = csub(csub(sub_lazy(mA, mB, 3), 4), 2)      # < 6.25p -> < 2p
        mC = mul(t1, Z3)                        # (3.38)(3.38) -> < 3.16p
        mD = mul(Y3, t0)                        # (2)(4.14) -> < 2.57p
        Y3 = csub(csub(add_lazy(mC, mD), 4), 2)         # < 5.73p -> < 2p
        mE = mul(Z3, t4)                        # (3.38)(3.38) -> < 3.16p
        mF = mul(t0, t3)                        # (4.14)(3.52) -> < 3.76p
        Z3 = csub(csub(add_lazy(mE, mF), 4), 2)         # < 6.92p -> < 2p

        same = mr[0, 0] > 0
        valid = mr[0, 1] > 0
        nX, nY, nZ = [], [], []
        for i in range(L12):
            nX.append(jnp.where(
                valid,
                jnp.where(same, X3[i], X2[i]),
                jnp.where(same, X1[i], zerov[i]),
            ))
            nY.append(jnp.where(
                valid,
                jnp.where(same, Y3[i], Y2[i]),
                jnp.where(same, Y1[i], onev[i]),
            ))
            nZ.append(jnp.where(
                valid,
                jnp.where(same, Z3[i], onev[i]),
                jnp.where(same, Z1[i], zerov[i]),
            ))
        for i in range(L12):
            ax[i] = nX[i]
            ay[i] = nY[i]
            az[i] = nZ[i]
        pX = r12m.pack16(nX)
        pY = r12m.pack16(nY)
        pZ = r12m.pack16(nZ)
        for i in range(L):
            ox[0, i] = pX[i]
            oy[0, i] = pY[i]
            oz[0, i] = pZ[i]

    return kernel


@functools.cache
def _madd_scan_full_call(spec: CurveSpec, m_steps: int, m_cols: int,
                         interpret: bool):
    from jax.experimental.pallas import tpu as pltpu

    rows = m_cols // LANE
    sub = _fold_sub(m_cols)
    if not sub:
        raise ValueError(f"no Mosaic-legal VMEM fold for m_cols={m_cols}; "
                         "callers must guard on _fold_sub > 0")
    if sub > 32:  # 9 (L, sub, 128) refs + double buffering in VMEM
        shrunk = 32
        while shrunk >= 8 and rows % shrunk:
            shrunk //= 2
        # the whole-array fold (sub == rows) stays legal even when > 32
        # (second-to-last dim == full dim); only shrink to a fold that
        # obeys the divisible-by-8 rule
        if shrunk >= 8:
            sub = shrunk
    # TPU-only (like _use_r12 in ntt.py): interpret-mode compile of the
    # 22-limb body is impractical; CPU covers the 16x16 kernel instead
    r12 = (not interpret
           and _os.environ.get("ZKDCAP_MSM_R12", "1") != "0")
    if r12:
        from ..fields.r12 import L12

        kernel = _mk_madd_scan_full_kernel_r12(spec, sub)
        scratch_l = L12
    else:
        kernel = _mk_madd_scan_full_kernel(spec, sub)
        scratch_l = L
    grid = (rows // sub, m_steps)
    spec_c = pl.BlockSpec((1, L, sub, LANE), lambda rb, m: (m, 0, rb, 0))
    spec_m = pl.BlockSpec((1, 3, sub, LANE), lambda rb, m: (m, 0, rb, 0))
    scratch = [pltpu.VMEM((scratch_l, sub, LANE), jnp.uint32) for _ in range(3)]
    kwargs = {}
    if r12 and not interpret:
        # the 22-limb unrolled interior exceeds the default 16 MB
        # scoped-vmem stack (see pallas_mont._fused_pass_call)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((m_steps, L, rows, LANE), jnp.uint32)
            for _ in range(3)
        ),
        grid=grid,
        in_specs=[spec_c, spec_m],
        out_specs=(spec_c, spec_c, spec_c),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )


def pack_affine_rows(points: jax.Array) -> jax.Array:
    """(N, 2, L) u32 16-bit-limb affine Montgomery points -> (N, L) u32
    packed rows (limbs 2j, 2j+1 as lo/hi u16; X planes 0..7, Y planes 8..15).
    The encoded infinity (0, 0) packs to an all-zero row."""
    n = points.shape[0]
    pairs = points.reshape(n, 2, L // 2, 2)
    return (pairs[..., 0] | (pairs[..., 1] << 16)).reshape(n, L)


def ec_madd_scan_full(spec: CurveSpec, Pm, masks):
    """Whole segmented scan: Pm (M, L, B) PACKED affine Montgomery stream
    (see pack_affine_rows; plane j<8 = X limb pair j, j>=8 = Y), masks
    (M, 3, B) uint32 rows [same-run; valid; negate-Y]. Returns the
    projective accumulator after every step as a 3-tuple of (M, L, B).
    B must be a multiple of 128."""
    interpret = jax.default_backend() != "tpu"
    m_steps, _, m_cols = Pm.shape
    rows = m_cols // LANE
    call = _madd_scan_full_call(spec, m_steps, m_cols, interpret)

    def fold(a):
        return a.reshape(m_steps, a.shape[1], rows, LANE)

    out = call(fold(Pm), fold(masks))
    return tuple(c.reshape(m_steps, L, m_cols) for c in out)


def ec_add_select(spec: CurveSpec, P, Q, mask, fallback: str):
    """Row-major wrapper: P, Q 3-tuples of (M, L); mask (M,) bool/int.

    Falls back to the jnp complete-add path off-TPU or for unaligned M."""
    M = P[0].shape[0]
    if M % LANE or not _fold_sub(M) or jax.default_backend() != "tpu":
        from .device_g1 import ec_add, ec_select

        s = ec_add(spec, P, Q)
        fb = Q if fallback == "q" else P
        return ec_select(mask > 0 if mask.dtype != jnp.bool_ else mask, s, fb)
    Pt = tuple(c.T for c in P)
    Qt = tuple(c.T for c in Q)
    m2 = mask.astype(jnp.uint32)[None, :]
    out = ec_add_select_lm(spec, Pt, Qt, m2, fallback)
    return tuple(c.T for c in out)
