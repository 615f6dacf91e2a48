"""Pallas TPU kernel: fused NTT butterfly over Montgomery limb vectors.

The pure-jnp Montgomery ops express the 16 CIOS rounds as a lax.scan, which
XLA materialises per round (~16x the ideal HBM traffic) — the NTT stage
time is dominated by it. This kernel computes a whole butterfly

    t = hi * w (Montgomery);  plus = lo + t;  minus = lo - t   (mod p)

in ONE pass over VMEM-resident blocks with the round loop fully unrolled
inside the kernel (no loop materialisation, one read + one write per stage).

Layout: limb-major (16, B) blocks — the batch axis rides the 128-wide lane
dimension, limbs ride sublanes, so every op is a full-width VPU op
(pallas_guide: tile (8,128) for 32-bit types; (16, B) = two sublane tiles).
Falls back to interpret mode off-TPU so the same code path is testable on
the CPU mesh.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .params import LIMB_BITS, LIMB_MASK, NUM_LIMBS, FieldParams

L = NUM_LIMBS
W = LIMB_BITS
MASK = LIMB_MASK
BLOCK = 512


def _mk_butterfly_kernel(params: FieldParams):
    p_limbs = [int(v) for v in params.p_limbs]
    n0inv = params.n0inv

    def kernel(lo_ref, hi_ref, w_ref, plus_ref, minus_ref):
        lo = [lo_ref[i, :] for i in range(L)]
        hi = [hi_ref[i, :] for i in range(L)]
        wv = [w_ref[i, :] for i in range(L)]
        zero = jnp.zeros_like(lo[0])

        # --- lazy-carry CIOS: t = hi * w * R^-1 mod p ---------------------
        t = [zero] * L
        for i in range(L):
            ai = hi[i]
            prod = [ai * wv[j] for j in range(L)]
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
        # carry sweep -> canonical limbs + overflow
        out = []
        c = zero
        for j in range(L):
            v = t[j] + c
            out.append(v & MASK)
            c = v >> W
        t = _cond_sub(out, c, p_limbs)

        # --- plus = lo + t ------------------------------------------------
        s = []
        c = zero
        for j in range(L):
            v = lo[j] + t[j] + c
            s.append(v & MASK)
            c = v >> W
        plus = _cond_sub(s, c, p_limbs)
        # --- minus = lo - t -----------------------------------------------
        d = []
        bw = zero
        for j in range(L):
            v = lo[j] - t[j] - bw
            d.append(v & MASK)
            bw = (v >> W) & 1
        # if borrow: add p back
        dp = []
        c = zero
        for j in range(L):
            v = d[j] + p_limbs[j] + c
            dp.append(v & MASK)
            c = v >> W
        neg = bw > 0
        minus = [jnp.where(neg, x, y) for x, y in zip(dp, d)]

        for j in range(L):
            plus_ref[j, :] = plus[j]
            minus_ref[j, :] = minus[j]

    def _cond_sub(limbs, overflow, p_l):
        d = []
        bw = jnp.zeros_like(limbs[0])
        for j in range(L):
            v = limbs[j] - p_l[j] - bw
            d.append(v & MASK)
            bw = (v >> W) & 1
        need = jnp.logical_or(overflow > 0, bw == 0)
        return [jnp.where(need, x, y) for x, y in zip(d, limbs)]

    return kernel


@functools.cache
def _butterfly_call(params: FieldParams, m_cols: int, interpret: bool):
    kernel = _mk_butterfly_kernel(params)
    grid = (m_cols // BLOCK,)
    spec = pl.BlockSpec((L, BLOCK), lambda i: (0, i))
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((L, m_cols), jnp.uint32),
            jax.ShapeDtypeStruct((L, m_cols), jnp.uint32),
        ),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec),
        interpret=interpret,
    )


def butterfly(params: FieldParams, lo_t: jax.Array, hi_t: jax.Array, w_t: jax.Array):
    """Limb-major butterfly: inputs (L, M) uint32 -> (plus, minus) (L, M).

    M must be a multiple of BLOCK (caller guarantees; NTT sizes are powers
    of two >= 1024 on the kernel path)."""
    interpret = jax.default_backend() != "tpu"
    call = _butterfly_call(params, lo_t.shape[1], interpret)
    return call(lo_t, hi_t, w_t)


def ntt_stage_supported(n_half: int) -> bool:
    return n_half % BLOCK == 0


# --- elementwise Montgomery multiply (limb-major) ---------------------------


def _mk_mul_kernel(params: FieldParams):
    p_limbs = [int(v) for v in params.p_limbs]
    n0inv = params.n0inv

    def kernel(a_ref, b_ref, out_ref):
        a = [a_ref[i, :] for i in range(L)]
        b = [b_ref[i, :] for i in range(L)]
        zero = jnp.zeros_like(a[0])
        t = [zero] * L
        for i in range(L):
            ai = a[i]
            prod = [ai * b[j] for j in range(L)]
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
        c = zero
        for j in range(L):
            v = t[j] + c
            out.append(v & MASK)
            c = v >> W
        # conditional subtract
        d = []
        bw = zero
        for j in range(L):
            v = out[j] - p_limbs[j] - bw
            d.append(v & MASK)
            bw = (v >> W) & 1
        need = jnp.logical_or(c > 0, bw == 0)
        for j in range(L):
            out_ref[j, :] = jnp.where(need, d[j], out[j])

    return kernel


_LANE = 128
_MAX_SUB = 64


def _fold_sub(m_cols: int) -> int:
    rows = m_cols // _LANE
    sub = _MAX_SUB
    while sub > 1 and rows % sub:
        sub //= 2
    return sub


@functools.cache
def _mul_call(params: FieldParams, m_cols: int, interpret: bool):
    kernel = _mk_mul_kernel(params)
    # fold lanes to (SUB, 128) tiles per limb: a flat (1, B) row uses only
    # 1 of 8 VPU sublanes
    sub = _fold_sub(m_cols)
    rows = m_cols // _LANE
    grid = (rows // sub,)
    spec = pl.BlockSpec((L, sub, _LANE), lambda i: (0, i, 0))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, rows, _LANE), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )


def mont_mul_lm(params: FieldParams, a_t: jax.Array, b_t: jax.Array) -> jax.Array:
    """Elementwise Montgomery multiply in limb-major (L, M) layout — ONE
    VMEM pass (the jnp mont_mul scan materialises all 16 CIOS rounds).
    M must be a multiple of 128."""
    interpret = jax.default_backend() != "tpu"
    m_cols = a_t.shape[1]
    rows = m_cols // _LANE
    call = _mul_call(params, m_cols, interpret)
    out = call(a_t.reshape(L, rows, _LANE), b_t.reshape(L, rows, _LANE))
    return out.reshape(L, m_cols)


# --- fused low-stage NTT pass ----------------------------------------------
#
# After the global bit-reversal, DIT stages s with span 2^(s+1) <= C are
# chunk-local AND share their twiddles across chunks. This kernel runs all
# of them in one VMEM residency per chunk: per stage, one CIOS multiply by a
# precomputed full-width twiddle vector (Montgomery ONE at lo positions, so
# lo lanes pass through), two pltpu.rolls to exchange butterfly partners,
# and a masked add/sub.

FUSED_CHUNK = 2048
FUSED_STAGES = 11  # log2(FUSED_CHUNK)


def _mk_fused_pass_kernel(params: FieldParams, n_stages: int, chunk: int,
                          sub: int = 1,
                          bitrev_in: bool = False, post_mul: bool = False):
    """bitrev_in: permute lanes i -> bitrev_{n_stages}(i) within each
    2^n_stages-aligned group IN VMEM before the stages (kills the HBM
    bit-reverse gather: 5 lane-roll pair-swaps ~= one stage's roll cost).
    post_mul: one extra CIOS by a per-lane operand after the last stage
    (the four-step inter-pass twiddles, saving a separate kernel launch +
    a full HBM round-trip of the array).
    sub: chunks processed per block, stacked in the SUBLANE dim — the VPU
    tile is (8, 128), so (1, chunk) rows leave 7/8 of it idle; (8, chunk)
    slabs run the same lane-wise rolls/butterflies on 8 independent chunks
    at full occupancy (measured 198 ms -> see BENCH.md at 2^22)."""
    from jax.experimental.pallas import tpu as pltpu

    p_limbs = [int(v) for v in params.p_limbs]
    n0inv = params.n0inv

    def kernel(x_ref, tw_ref, hi_ref, *rest):
        # x_ref: (L, sub, chunk); tw_ref: (n_stages, L, chunk);
        # hi_ref: (n_stages, 1, chunk); rest: [ptw_ref (L, sub, chunk)] if
        # post_mul; then out_ref. Twiddle/mask rows stay (1, chunk) and
        # broadcast over the sublane dim; rolls act on the lane dim, which
        # is identical for every sublane row.
        ptw_ref = rest[0] if post_mul else None
        out_ref = rest[-1]
        x = [x_ref[i] for i in range(L)]  # (sub, chunk) each
        zero = jnp.zeros((1, chunk), jnp.uint32)

        if bitrev_in:
            # lane index i = g*2^S + b: reverse the low S bits of b by
            # swapping bit pairs (a, S-1-a). A swap moves a lane by
            # +-delta = +-(2^b - 2^a); both destinations stay inside the
            # lane's own 2^S group, so cyclic rolls are safe.
            S = n_stages
            lane = jax.lax.broadcasted_iota(jnp.uint32, (1, chunk), 1)
            for a in range(S // 2):
                b = S - 1 - a
                if a == b:
                    continue
                delta = (1 << b) - (1 << a)
                bit_a = (lane >> a) & 1
                bit_b = (lane >> b) & 1
                from_lo = jnp.logical_and(bit_a == 0, bit_b == 1)  # i' = i - delta
                from_hi = jnp.logical_and(bit_a == 1, bit_b == 0)  # i' = i + delta
                x = [
                    jnp.where(
                        from_lo,
                        pltpu.roll(v, delta, 1),  # lane i <- v[i - delta]
                        jnp.where(from_hi, pltpu.roll(v, chunk - delta, 1), v),
                    )
                    for v in x
                ]

        def cios(a, b):
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
            c = zero
            for j in range(L):
                v = t[j] + c
                out.append(v & MASK)
                c = v >> W
            return cond_sub(out, c)

        def cond_sub(limbs, overflow):
            d = []
            bw = zero
            for j in range(L):
                v = limbs[j] - p_limbs[j] - bw
                d.append(v & MASK)
                bw = (v >> W) & 1
            need = jnp.logical_or(overflow > 0, bw == 0)
            return [jnp.where(need, a_, b_) for a_, b_ in zip(d, limbs)]

        def fadd(a, b):
            s = []
            c = zero
            for j in range(L):
                v = a[j] + b[j] + c
                s.append(v & MASK)
                c = v >> W
            return cond_sub(s, c)

        def fsub(a, b):
            d = []
            bw = zero
            for j in range(L):
                v = a[j] - b[j] - bw
                d.append(v & MASK)
                bw = (v >> W) & 1
            dp = []
            c = zero
            for j in range(L):
                v = d[j] + p_limbs[j] + c
                dp.append(v & MASK)
                c = v >> W
            neg = bw > 0
            return [jnp.where(neg, a_, b_) for a_, b_ in zip(dp, d)]

        for s in range(n_stages):
            m = 1 << s
            tw = [tw_ref[s, i : i + 1, :] for i in range(L)]
            is_hi = hi_ref[s, 0:1, :] > 0
            y = cios(x, tw)  # lo lanes multiplied by ONE pass through
            p_lo = [pltpu.roll(v, chunk - m, 1) for v in y]  # lane i <- y[i+m]
            p_hi = [pltpu.roll(v, m, 1) for v in y]  # lane i <- y[i-m]
            part = [jnp.where(is_hi, a_, b_) for a_, b_ in zip(p_hi, p_lo)]
            plus = fadd(y, part)  # lo: y_lo + w*hi
            minus = fsub(part, y)  # hi: lo - w*hi
            x = [jnp.where(is_hi, mn, pl) for mn, pl in zip(minus, plus)]

        if post_mul:
            ptw = [ptw_ref[i] for i in range(L)]
            x = cios(x, ptw)

        for i in range(L):
            out_ref[i] = jnp.broadcast_to(x[i], (sub, chunk))

    return kernel


def _mk_fused_pass_kernel_r12(params: FieldParams, n_stages: int, chunk: int,
                              sub: int = 1,
                              bitrev_in: bool = False, post_mul: bool = False):
    """Redundant 12-bit-limb variant of the fused NTT pass (fields/r12.py).

    Same dataflow as _mk_fused_pass_kernel; the interior runs 22x12-bit
    digits so every Montgomery iteration is mul+add with no lo/hi product
    splitting (~2.1k u32 ops per stage-mul vs ~2.9k). Twiddle tables carry
    the 2^8 radix-mismatch factor (r12.scale_mont_factor), so every lane's
    value collapses below ~1.03p at each stage's REDC — no growth chain —
    and the exit does the canonical < p reduction: outputs are
    bit-identical to the 16x16 kernel's.
    """
    from jax.experimental.pallas import tpu as pltpu

    from . import r12 as r12m

    p = params.p
    L12 = r12m.L12

    def kernel(x_ref, tw_ref, hi_ref, *rest):
        # x_ref: (L, sub, chunk) 16-bit digits; tw_ref: (S, L12, chunk)
        # canonical scaled 12-bit digits; hi_ref: (S, 1, chunk);
        # rest: [ptw_ref (L12, sub, chunk)] if post_mul; then out_ref.
        ptw_ref = rest[0] if post_mul else None
        out_ref = rest[-1]
        cios12, csub, add_lazy, sub_lazy = r12m.make_ops(params)
        x16 = [x_ref[i] for i in range(L)]

        if bitrev_in:
            S = n_stages
            lane = jax.lax.broadcasted_iota(jnp.uint32, (1, chunk), 1)
            for a in range(S // 2):
                b = S - 1 - a
                if a == b:
                    continue
                delta = (1 << b) - (1 << a)
                bit_a = (lane >> a) & 1
                bit_b = (lane >> b) & 1
                from_lo = jnp.logical_and(bit_a == 0, bit_b == 1)
                from_hi = jnp.logical_and(bit_a == 1, bit_b == 0)
                x16 = [
                    jnp.where(
                        from_lo,
                        pltpu.roll(v, delta, 1),
                        jnp.where(from_hi, pltpu.roll(v, chunk - delta, 1), v),
                    )
                    for v in x16
                ]

        x = r12m.unpack16(x16)  # canonical 12-bit digits, value < p

        for s in range(n_stages):
            m = 1 << s
            tw = [tw_ref[s, i : i + 1, :] for i in range(L12)]
            is_hi = hi_ref[s, 0:1, :] > 0
            y = cios12(x, tw)  # every lane < 1.03p (lo lanes * scaled ONE)
            p_lo = [pltpu.roll(v, chunk - m, 1) for v in y]
            p_hi = [pltpu.roll(v, m, 1) for v in y]
            part = [jnp.where(is_hi, a_, b_) for a_, b_ in zip(p_hi, p_lo)]
            plus = add_lazy(y, part)          # < 2.06p
            minus = sub_lazy(part, y, 2)      # part - y + 2p < 3.03p
            x = [jnp.where(is_hi, mn, pl) for mn, pl in zip(minus, plus)]

        if post_mul:
            ptw = [ptw_ref[i] for i in range(L12)]
            x = cios12(x, ptw)  # < 1.03p
            x = csub(x, 1)
        else:
            x = csub(csub(x, 2), 1)  # < 3.03p -> canonical

        x16o = r12m.pack16(x)
        for i in range(L):
            out_ref[i] = jnp.broadcast_to(x16o[i], (sub, chunk))

    return kernel


@functools.cache
def _fused_pass_call(params: FieldParams, n_stages: int, n_cols: int, interpret: bool,
                     bitrev_in: bool = False, post_mul: bool = False,
                     r12: bool = False, cg: bool = False):
    from .r12 import L12

    n_chunks = n_cols // FUSED_CHUNK
    sub = 8
    while n_chunks % sub:
        sub //= 2
    if cg:
        kernel = _mk_cg_pass_kernel_r12(params, n_stages, FUSED_CHUNK,
                                        sub=sub, post_mul=post_mul)
    else:
        mk = _mk_fused_pass_kernel_r12 if r12 else _mk_fused_pass_kernel
        kernel = mk(params, n_stages, FUSED_CHUNK, sub=sub,
                    bitrev_in=bitrev_in, post_mul=post_mul)
    Lt = L12 if r12 else L  # twiddle-table limb count
    grid = (n_chunks // sub,)
    x_spec = pl.BlockSpec((L, sub, FUSED_CHUNK), lambda i: (0, i, 0))
    ptw_spec = pl.BlockSpec((Lt, sub, FUSED_CHUNK), lambda i: (0, i, 0))
    if cg:
        tw_spec = pl.BlockSpec(
            (n_stages, Lt, 1, FUSED_CHUNK // 2), lambda i: (0, 0, 0, 0))
        in_specs = [x_spec, tw_spec]
    else:
        tw_spec = pl.BlockSpec((n_stages, Lt, FUSED_CHUNK), lambda i: (0, 0, 0))
        hi_spec = pl.BlockSpec((n_stages, 1, FUSED_CHUNK), lambda i: (0, 0, 0))
        in_specs = [x_spec, tw_spec, hi_spec]
    if post_mul:
        in_specs.append(ptw_spec)  # per-lane post-multiply operand
    kwargs = {}
    if (r12 or cg) and not interpret:
        # the 22-limb unrolled interior keeps more live temporaries than
        # the default 16 MB scoped-vmem stack allows (observed 27.3 MB at
        # sub=2); v5e has 128 MB VMEM per core, so raise the cap
        from jax.experimental.pallas import tpu as pltpu

        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n_chunks, FUSED_CHUNK), jnp.uint32),
        grid=grid,
        in_specs=in_specs,
        out_specs=x_spec,
        interpret=interpret,
        **kwargs,
    )

    def wrapper(flat, tw, *rest):
        # flat (L, n_cols) <-> (L, n_chunks, chunk): free reshapes, no data
        # movement; the sublane stacking happens via the BlockSpec.
        # rest = [hi] (roll kernel) and/or [ptw] (post_mul), in order.
        args = [flat.reshape(L, n_chunks, FUSED_CHUNK), tw]
        rest = list(rest)
        if not cg:
            args.append(rest.pop(0))  # hi mask table
        if rest:
            args.append(rest[0].reshape(Lt, n_chunks, FUSED_CHUNK))
        out = call(*args)
        return out.reshape(L, n_cols)

    return wrapper


@functools.cache
def _fused_pass_tables_np(params: FieldParams, log_n: int, inverse: bool = False):
    """Host-precomputed (S, L, C) twiddle vectors (Montgomery, ONE at lo
    lanes) and (S, 1, C) hi-lane masks for the fused low-stage pass.

    Cached as NUMPY: jnp.asarray inside an outer trace returns a traced
    constant, and memoising THAT leaks the tracer into later traces
    (UnexpectedTracerError when intt_many is first reached inside a jitted
    prover-round program — TPU-only path, fused kernels are backend-gated)."""
    import numpy as np

    from .params import R, int_to_limbs

    C = FUSED_CHUNK
    S = min(FUSED_STAGES, log_n)
    n = 1 << log_n
    p = params.p
    w = params.nth_root_of_unity(log_n)
    if inverse:
        w = pow(w, -1, p)
    one_m = int_to_limbs(R % p)
    tw = np.zeros((S, L, C), dtype=np.uint32)
    hi = np.zeros((S, 1, C), dtype=np.uint32)
    for s in range(S):
        m = 1 << s
        stride = n >> (s + 1)
        for i in range(C):
            if (i >> s) & 1:  # hi lane
                j = i & (m - 1)
                val = int_to_limbs(pow(w, j * stride, p) * R % p)
                hi[s, 0, i] = 1
            else:
                val = one_m
            tw[s, :, i] = val
    return tw, hi


def fused_pass_tables(params: FieldParams, log_n: int, inverse: bool = False):
    tw, hi = _fused_pass_tables_np(params, log_n, inverse)
    return jnp.asarray(tw), jnp.asarray(hi)


@functools.cache
def _fused_pass_tables12_np(params: FieldParams, log_n: int,
                            inverse: bool = False):
    """(S, 22, C) canonical 12-bit-digit twiddles pre-scaled by 2^8
    (r12.scale_mont_factor) + (S, 1, C) hi masks, for the r12 kernel."""
    import numpy as np

    from .params import R
    from .r12 import L12, int_to_limbs12, scale_mont_factor

    C = FUSED_CHUNK
    S = min(FUSED_STAGES, log_n)
    n = 1 << log_n
    p = params.p
    scale = scale_mont_factor(params)
    w = params.nth_root_of_unity(log_n)
    if inverse:
        w = pow(w, -1, p)
    one_s = int_to_limbs12(R * scale % p)
    tw = np.zeros((S, L12, C), dtype=np.uint32)
    hi = np.zeros((S, 1, C), dtype=np.uint32)
    for s in range(S):
        m = 1 << s
        stride = n >> (s + 1)
        for i in range(C):
            if (i >> s) & 1:  # hi lane
                j = i & (m - 1)
                val = int_to_limbs12(pow(w, j * stride, p) * R * scale % p)
                hi[s, 0, i] = 1
            else:
                val = one_s
            tw[s, :, i] = val
    return tw, hi


def fused_pass_tables12(params: FieldParams, log_n: int, inverse: bool = False):
    tw, hi = _fused_pass_tables12_np(params, log_n, inverse)
    return jnp.asarray(tw), jnp.asarray(hi)


# --- grouped constant-geometry NTT pass (half-width twiddle muls) ----------
#
# The roll-based fused pass multiplies EVERY lane by a twiddle (Montgomery
# ONE on lo lanes) to keep the dataflow uniform — 2x the muls a classical
# NTT needs, and the kernel is VPU-compute-bound. This variant runs plain
# DIF stages in groups whose spans stay >= 128 lanes (lo/hi are contiguous
# lane-tile-aligned slices, so the cios runs on HALF the lanes), and
# restores large spans after each group with a rho^g block interleave (the
# composition of g per-stage constant-geometry interleaves). Output order
# is fixed by one in-VMEM bit-permutation (pair-swap rolls, like the DIT
# kernel's bitrev prologue). Schedule derivation + host-side numpy
# validation: the tables are exact DIF twiddles re-indexed through the
# layout bit-permutation pi that the interleaves induce.


def _cg_groups(S: int) -> list[int]:
    maxg = max(S - 7, 1)  # spans 2^(S-1)..2^(S-g) must stay >= 2^7
    gs = []
    left = S
    while left > 0:
        g = min(maxg, left, 4)
        gs.append(g)
        left -= g
    return gs


@functools.cache
def _cg_schedule(S: int):
    """Per-stage twiddle exponents (layout half-position order) and the
    final layout -> natural-order lane bit-permutation."""
    import numpy as np

    n = 1 << S
    groups = _cg_groups(S)
    pi = list(range(S))
    tables = []
    logical_stage = 0
    for gi, g in enumerate(groups):
        for k in range(g):
            t = S - 1 - k
            assert pi[t] == S - 1 - logical_stage
            M = 1 << (S - 1 - logical_stage)
            half = n // 2
            h = np.arange(half, dtype=np.int64)
            l_hi = ((h >> t) << (t + 1)) | (1 << t) | (h & ((1 << t) - 1))
            j = np.zeros(half, dtype=np.int64)
            for lb in range(S):
                j |= ((l_hi >> lb) & 1) << pi[lb]
            tables.append(((j % M) * (n // (2 * M))).astype(np.int64))
            logical_stage += 1
        if gi != len(groups) - 1:
            pi = [pi[(i - g) % S] for i in range(S)]
    # natural-order fix: out[q] = stage_output[final(q)] where
    # final(q) = sum_lb bit_{S-1-pi[lb]}(q) << lb (DIF output is the
    # bit-reversed coefficient order, read back through pi). Decompose
    # final into index-bit transpositions (each realised in VMEM as two
    # rolls + select) and VERIFY the sequence numerically.
    fbits = [S - 1 - pi[lb] for lb in range(S)]  # final's bit source map
    return groups, tables, _swaps_for_bitmap(tuple(fbits))


@functools.cache
def _swaps_for_bitmap(fbits: tuple[int, ...]):
    """Index-bit-swap sequence realising out[k] = in[F(k)] with
    F(k) = sum_lb bit_{fbits[lb]}(k) << lb, verified numerically. The
    kernel applies y[l] = x[tau(l)] per swap in order, so the net map is
    tau_first(tau_second(...))."""
    S = len(fbits)
    n = 1 << S

    def apply_final(q: int) -> int:
        return sum(((q >> fbits[lb]) & 1) << lb for lb in range(S))

    def apply_swap_seq(swaps_, q: int) -> int:
        for a, b in reversed(swaps_):
            ba, bb = (q >> a) & 1, (q >> b) & 1
            q = q & ~((1 << a) | (1 << b)) | (ba << b) | (bb << a)
        return q

    perm = list(fbits)
    swaps = []
    cur = list(range(S))
    for lb in range(S):
        if cur[lb] == perm[lb]:
            continue
        j = cur.index(perm[lb])
        swaps.append((min(lb, j), max(lb, j)))
        cur[lb], cur[j] = cur[j], cur[lb]
    for order in (swaps, list(reversed(swaps))):
        if all(apply_swap_seq(order, q) == apply_final(q)
               for q in range(min(n, 4096))):
            return order
    raise AssertionError("bit-permutation decomposition failed")


def _lane_bit_swap(x_planes, a: int, b: int, chunk: int):
    """Swap lane-index bits a<b within each 2^(b+1)-aligned group via two
    cyclic rolls + select (the bitrev prologue's primitive)."""
    from jax.experimental.pallas import tpu as pltpu

    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, chunk), 1)
    delta = (1 << b) - (1 << a)
    bit_a = (lane >> a) & 1
    bit_b = (lane >> b) & 1
    from_lo = jnp.logical_and(bit_a == 0, bit_b == 1)
    from_hi = jnp.logical_and(bit_a == 1, bit_b == 0)
    return [
        jnp.where(
            from_lo,
            pltpu.roll(v, delta, 1),
            jnp.where(from_hi, pltpu.roll(v, chunk - delta, 1), v),
        )
        for v in x_planes
    ]


def _mk_cg_pass_kernel_r12(params: FieldParams, n_stages: int, chunk: int,
                           sub: int = 1, post_mul: bool = False):
    """Constant-geometry r12 NTT pass: natural-order input, natural-order
    output, bit-identical to the roll-based DIT kernel."""
    from . import r12 as r12m

    L12 = r12m.L12
    S = n_stages
    groups, _, swaps = _cg_schedule(S)
    nblk = chunk >> S  # independent transforms per chunk

    def kernel(x_ref, tw_ref, *rest):
        ptw_ref = rest[0] if post_mul else None
        out_ref = rest[-1]
        cios12, csub, add_lazy, sub_lazy = r12m.make_ops(params)
        x16 = [x_ref[i] for i in range(L)]
        x = r12m.unpack16(x16)  # canonical digits, < p

        half = chunk // 2
        ti = 0
        for gi, g in enumerate(groups):
            for k in range(g):
                m = 1 << (S - 1 - k)
                tw = [tw_ref[ti, i, 0:1, :] for i in range(L12)]

                def lohi(v):
                    A = v.reshape(sub, chunk // (2 * m), 2, m)
                    return (
                        A[:, :, 0, :].reshape(sub, half),
                        A[:, :, 1, :].reshape(sub, half),
                    )

                lo, hi = zip(*(lohi(v) for v in x))
                lo, hi = list(lo), list(hi)
                s_ = csub(add_lazy(lo, hi), 2)        # < 2p
                d_ = sub_lazy(lo, hi, 2)              # < 4p
                t_ = cios12(d_, tw)                   # < 1.03p
                x = [
                    jnp.stack(
                        [a_.reshape(sub, chunk // (2 * m), m),
                         b_.reshape(sub, chunk // (2 * m), m)], axis=2
                    ).reshape(sub, chunk)
                    for a_, b_ in zip(s_, t_)
                ]
                ti += 1
            if gi != len(groups) - 1:
                # rho^g block interleave within each 2^S-aligned group:
                # out[k] = in[rotr_g(k)] — an index-bit rotation, realised
                # as lane-bit pair swaps (Mosaic rejects the equivalent
                # minor-dim-2^g swapaxes as an unsupported shape cast)
                for a, b in _swaps_for_bitmap(
                    tuple((lb + g) % S for lb in range(S))
                ):
                    x = _lane_bit_swap(x, a, b, chunk)

        for a, b in swaps:
            lo_b, hi_b = min(a, b), max(a, b)
            x = _lane_bit_swap(x, lo_b, hi_b, chunk)

        if post_mul:
            ptw = [ptw_ref[i] for i in range(L12)]
            x = cios12(x, ptw)  # < 1.03p
            x = csub(x, 1)
        else:
            x = csub(x, 1)  # < 2p -> canonical

        x16o = r12m.pack16(x)
        for i in range(L):
            out_ref[i] = jnp.broadcast_to(x16o[i], (sub, chunk))

    return kernel


@functools.cache
def _cg_tables12_np(params: FieldParams, log_n: int, inverse: bool = False):
    """(S, L12, 1, C/2) canonical 12-bit-digit CG twiddles pre-scaled by
    2^8 (see fused_pass_tables12), in layout half-position order."""
    import numpy as np

    from .params import R
    from .r12 import L12, int_to_limbs12, scale_mont_factor

    S = log_n
    n = 1 << S
    C = FUSED_CHUNK
    half = C // 2
    p = params.p
    scale = scale_mont_factor(params)
    w = params.nth_root_of_unity(log_n)
    if inverse:
        w = pow(w, -1, p)
    _, tables, _ = _cg_schedule(S)
    tw = np.zeros((S, L12, 1, half), dtype=np.uint32)
    reps = half // ((n // 2) or 1)
    for s in range(S):
        exps = tables[s]
        vals = {}
        for h in range(n // 2):
            e = int(exps[h])
            if e not in vals:
                vals[e] = int_to_limbs12(pow(w, e, p) * R * scale % p)
        for h in range(n // 2):
            limbs = vals[int(exps[h])]
            # blocks repeat across the chunk: half-positions of block r are
            # offset by r * n//2 ... wait: half-position h indexes pairs of
            # the WHOLE chunk; with nblk blocks the reshape (C//(2m), m)
            # walks blocks in order, pair j of block r at h_global =
            # r*(n//2) + h for every stage (spans subdivide blocks).
            for r in range(reps):
                tw[s, :, 0, r * (n // 2) + h] = limbs
    return tw


def fused_cg_tables12(params: FieldParams, log_n: int, inverse: bool = False):
    return jnp.asarray(_cg_tables12_np(params, log_n, inverse))


def fused_low_stages(params: FieldParams, at: jax.Array, log_n: int,
                     inverse: bool = False) -> tuple[jax.Array, int]:
    """Run stages 0..min(11, log_n)-1 on a limb-major bit-reversed array.

    Returns (array, first_unprocessed_stage)."""
    n = at.shape[1]
    S = min(FUSED_STAGES, log_n)
    if n < FUSED_CHUNK or n % FUSED_CHUNK:
        return at, 0
    tw, hi = fused_pass_tables(params, log_n, inverse)
    interpret = jax.default_backend() != "tpu"
    call = _fused_pass_call(params, S, n, interpret)
    return call(at, tw, hi), S
