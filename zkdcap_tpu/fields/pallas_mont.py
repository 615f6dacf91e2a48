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
