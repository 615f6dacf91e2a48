"""Pippenger multi-scalar multiplication on TPU.

TPU-native replacement for halo2's rayon Pippenger (SURVEY.md §2.3 row 1:
"bucket accumulation via sort/segment-sum (no scatter)"). This is THE hot
op of the prover: every polynomial commitment is one MSM
(`create_proof` steps 2-5/8, SURVEY.md §3.1).

Algorithm (per 8-bit window, 32 windows for 256-bit scalars):
  1. sort point indices by bucket digit (XLA bitonic sort — no scatter),
  2. lane-chunked segmented reduction: the sorted stream is split into G
     lanes of M points; each lane runs a sequential segmented scan (M
     steps of one G-wide complete EC add) — O(N) EC-add work, M deep,
  3. per-run partial sums (<= 255 digit runs + G lane tails) are compacted
     with top_k and combined by a log-depth segmented Hillis–Steele scan,
  4. bucket totals land in a dense 256-entry table via unique-index scatter,
  5. classic suffix-sum bucket aggregation (S += B_d; T += S), vectorised
     across all 32 windows, then a Horner window join (8 doublings/window).

Digit-0 points and encoded infinities are mapped to the projective identity
(0:1:0), which the complete formulas absorb — no control flow anywhere.

The multi-chip shard (points sharded across the mesh, per-window bucket
sums reduced with psum-style tree adds) lives in
`zkdcap_tpu/parallel/sharded_msm.py`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..curves.device_g1 import (
    CurveSpec,
    G1_SPEC,
    affine_to_projective,
    decode_points,
    ec_add,
    ec_double,
    ec_inf,
    ec_select,
)
from ..fields import BN254_FR, mont
from ..fields.params import NUM_LIMBS

WINDOW_BITS = 8
NUM_WINDOWS = 32  # 256-bit scalars
NUM_BUCKETS = 1 << WINDOW_BITS
L = NUM_LIMBS


def _digits(scalars_std: jax.Array) -> jax.Array:
    """uint32[N, 16] standard-form limbs -> int32[32, N] 8-bit window digits."""
    outs = []
    for w in range(NUM_WINDOWS):
        limb = scalars_std[:, w // 2]
        outs.append(((limb >> (8 * (w % 2))) & jnp.uint32(0xFF)).astype(jnp.int32))
    return jnp.stack(outs)


@partial(jax.jit, static_argnums=(0, 3))
def msm_device(spec: CurveSpec, points: jax.Array, scalars_std: jax.Array, lanes: int):
    """points: uint32[N,2,L] Montgomery affine ((0,0)=inf); scalars_std:
    uint32[N,16] standard form. N must be a multiple of `lanes`.
    Returns a single projective Point."""
    f = spec.field
    N = points.shape[0]
    G = lanes
    M = N // G
    assert G * M == N
    K = min(N, G + NUM_BUCKETS)  # upper bound on per-window run partials

    digits = _digits(scalars_std)  # (32, N)
    Px, Py = points[:, 0], points[:, 1]
    pt_is_inf = jnp.logical_and(mont.is_zero(Px), mont.is_zero(Py))  # (N,)

    idxN = jnp.arange(N, dtype=jnp.int32)
    idxK = jnp.arange(K, dtype=jnp.int32)
    window_par = 8
    WP = window_par
    from ..curves.ec_kernels import ec_add_select

    def sort_part(d_w):
        order = jnp.argsort(d_w)
        d = jnp.take(d_w, order)
        X = jnp.take(Px, order, axis=0)
        Y = jnp.take(Py, order, axis=0)
        valid = jnp.logical_and(d != 0, jnp.logical_not(jnp.take(pt_is_inf, order)))
        one = mont.one_mont(f, (N,))
        Xp = jnp.where(valid[:, None], X, 0)
        Yp = jnp.where(valid[:, None], Y, one)
        Zp = jnp.where(valid[:, None], one, 0)
        return Xp, Yp, Zp, d

    def compact_part(sX, sY, sZ, d):
        # -- stage 3a: compact run partials via top_k ----------------------
        is_lane_end = (idxN % M) == (M - 1)
        d_next = jnp.concatenate([d[1:], jnp.full((1,), -1, jnp.int32)])
        is_end = jnp.logical_or(is_lane_end, d != d_next)
        key = jnp.where(is_end, idxN, -1)
        top_keys, _ = jax.lax.top_k(key, K)  # descending position order
        safe = jnp.maximum(top_keys, 0)
        vd = jnp.take(d, safe)
        vX = jnp.take(sX, safe, axis=0)
        vY = jnp.take(sY, safe, axis=0)
        vZ = jnp.take(sZ, safe, axis=0)
        dead = jnp.logical_or(top_keys < 0, vd == 0)
        vd = jnp.where(dead, 0, vd)
        one_k = mont.one_mont(f, (K,))
        vX = jnp.where(dead[:, None], 0, vX)
        vY = jnp.where(dead[:, None], one_k, vY)
        vZ = jnp.where(dead[:, None], 0, vZ)
        return vX, vY, vZ, vd

    def deposit_part(cX, cY, cZ, vd):
        # -- stage 4: deposit group totals into dense buckets --------------
        vd_next = jnp.concatenate([vd[1:], jnp.full((1,), -1, jnp.int32)])
        is_last = vd != vd_next
        slot = jnp.where(jnp.logical_and(is_last, vd > 0), vd, NUM_BUCKETS)
        bX = jnp.zeros((NUM_BUCKETS + 1, L), jnp.uint32).at[slot].set(cX)[:NUM_BUCKETS]
        bY = jnp.concatenate(
            [jnp.broadcast_to(mont.one_mont(f, (NUM_BUCKETS,)), (NUM_BUCKETS, L)),
             jnp.zeros((1, L), jnp.uint32)], axis=0
        ).at[slot].set(cY)[:NUM_BUCKETS]
        bZ = jnp.zeros((NUM_BUCKETS + 1, L), jnp.uint32).at[slot].set(cZ)[:NUM_BUCKETS]
        return bX, bY, bZ

    def group_fn(d_grp):
        # (WP, N) digits -> (WP, 256) buckets. The EC-heavy stages run on
        # merged (WP*G) lanes through the fused pallas add kernel.
        Xp, Yp, Zp, d = jax.vmap(sort_part)(d_grp)  # (WP, N, L) x3, (WP, N)

        # -- stage 2: per-lane segmented scan (kernelized EC adds) ---------
        # (M, L, B) layout, B = WP*G merged lanes: each step j reads a
        # CONTIGUOUS (L, B) limb-major block and feeds the fused pallas add
        # kernel directly — the row-major wrapper's 9 per-iteration 8 MB
        # transposes (measured: they, not the sorts, dominated the round-1
        # 2.87 s) are hoisted into ONE layout transpose per group.
        B = WP * G
        from ..curves.ec_kernels import BLOCK as EC_BLOCK, ec_add_select_lm

        use_lm = B % EC_BLOCK == 0 and jax.default_backend() == "tpu"

        def to_mlb(A):  # (WP, N, L) -> (M, L, B)
            return A.reshape(WP, G, M, L).transpose(2, 3, 0, 1).reshape(M, L, B)

        Xm, Ym, Zm = to_mlb(Xp), to_mlb(Yp), to_mlb(Zp)
        dm = d.reshape(WP, G, M).transpose(2, 0, 1).reshape(M, B)
        # same-digit-as-previous-in-lane mask, precomputed (row 0 = False)
        sames = jnp.concatenate(
            [jnp.zeros((1, B), jnp.uint32),
             (dm[1:] == dm[:-1]).astype(jnp.uint32)], axis=0
        )

        out0 = jnp.zeros((M, L, B), jnp.uint32)
        one_b = mont.one_mont(f, (1,))[0]
        iX = jnp.zeros((L, B), jnp.uint32)
        iY = jnp.broadcast_to(one_b[:, None], (L, B))
        iZ = jnp.zeros((L, B), jnp.uint32)

        def step(j, carry):
            (aX, aY, aZ), (oX, oY, oZ) = carry
            Pj = tuple(
                jax.lax.dynamic_index_in_dim(arr, j, 0, keepdims=False)
                for arr in (Xm, Ym, Zm)
            )
            same = jax.lax.dynamic_index_in_dim(sames, j, 0, keepdims=False)[None, :]
            if use_lm:
                new = ec_add_select_lm(spec, (aX, aY, aZ), Pj, same, fallback="q")
            else:
                rm = ec_add_select(
                    spec,
                    tuple(c.T for c in (aX, aY, aZ)),
                    tuple(c.T for c in Pj),
                    same[0],
                    fallback="q",
                )
                new = tuple(c.T for c in rm)
            oX = jax.lax.dynamic_update_index_in_dim(oX, new[0], j, 0)
            oY = jax.lax.dynamic_update_index_in_dim(oY, new[1], j, 0)
            oZ = jax.lax.dynamic_update_index_in_dim(oZ, new[2], j, 0)
            return (new, (oX, oY, oZ))

        _, (oX, oY, oZ) = jax.lax.fori_loop(
            0, M, step, ((iX, iY, iZ), (out0, out0, out0))
        )

        def from_mlb(A):  # (M, L, B) -> (WP, N, L)
            return A.reshape(M, L, WP, G).transpose(2, 3, 0, 1).reshape(WP, N, L)

        sX = from_mlb(oX)
        sY = from_mlb(oY)
        sZ = from_mlb(oZ)

        vX, vY, vZ, vd = jax.vmap(compact_part)(sX, sY, sZ, d)  # (WP, K, ...)

        # -- stage 3b: segmented Hillis-Steele on merged lanes -------------
        # dead prefix blocks for the shifted reads: identity points, digit 0
        padX = jnp.zeros((WP, K, L), jnp.uint32)
        padY = jnp.broadcast_to(mont.one_mont(f, (WP, K)), (WP, K, L))
        padZ = jnp.zeros((WP, K, L), jnp.uint32)
        padd = jnp.zeros((WP, K), jnp.int32)
        idxK2 = jnp.arange(K, dtype=jnp.int32)
        n_levels = max((K - 1).bit_length(), 1)

        def level(s, carry):
            cX, cY, cZ = carry
            shift = jnp.left_shift(jnp.int32(1), s)
            start = K - shift

            def shifted(arr, pad):
                big = jnp.concatenate([pad, arr], axis=1)
                return jax.lax.dynamic_slice_in_dim(big, start, K, axis=1)

            pXs = shifted(cX, padX)
            pYs = shifted(cY, padY)
            pZs = shifted(cZ, padZ)
            pds = shifted(vd, padd)
            ok = jnp.logical_and(idxK2[None, :] >= shift, pds == vd)
            ok = jnp.logical_and(ok, vd != 0)
            new = ec_add_select(
                spec,
                tuple(c.reshape(WP * K, L) for c in (cX, cY, cZ)),
                tuple(c.reshape(WP * K, L) for c in (pXs, pYs, pZs)),
                ok.reshape(WP * K),
                fallback="p",
            )
            return tuple(c.reshape(WP, K, L) for c in new)

        cX, cY, cZ = jax.lax.fori_loop(0, n_levels, level, (vX, vY, vZ))
        return jax.vmap(deposit_part)(cX, cY, cZ, vd)

    dgroups = digits.reshape(NUM_WINDOWS // window_par, window_par, N)
    bX, bY, bZ = jax.lax.map(group_fn, dgroups)
    bX = bX.reshape(NUM_WINDOWS, NUM_BUCKETS, L)
    bY = bY.reshape(NUM_WINDOWS, NUM_BUCKETS, L)
    bZ = bZ.reshape(NUM_WINDOWS, NUM_BUCKETS, L)

    # -- stage 5: log-depth aggregation: sum_d d*B_d = sum_{d>=1} S_d where
    # S_d = suffix sums of buckets — a Hillis-Steele suffix scan (8 wide EC
    # adds) followed by a tree reduction (8 more), instead of 2*255
    # sequential tiny adds.
    S = (bX, bY, bZ)
    idxB = jnp.arange(NUM_BUCKETS, dtype=jnp.int32)

    from ..curves.ec_kernels import ec_add_select as _eas

    def suffix_level(s, carry):
        cX, cY, cZ = carry
        shift = jnp.left_shift(jnp.int32(1), s)
        nX = jnp.roll(cX, -shift, axis=1)
        nY = jnp.roll(cY, -shift, axis=1)
        nZ = jnp.roll(cZ, -shift, axis=1)
        valid = (idxB + shift) < NUM_BUCKETS  # (256,)
        vb = jnp.broadcast_to(valid[None, :], cX.shape[:2])
        flatP = tuple(c.reshape(-1, L) for c in (cX, cY, cZ))
        flatQ = tuple(c.reshape(-1, L) for c in (nX, nY, nZ))
        new = _eas(spec, flatP, flatQ, vb.reshape(-1), fallback="p")
        return tuple(c.reshape(cX.shape) for c in new)

    S = jax.lax.fori_loop(0, WINDOW_BITS, suffix_level, S)
    # zero out bucket 0 (digit 0 contributes nothing): drop index 0, then
    # tree-reduce S_1..S_255 (pad with identity to 256 lanes)
    SX, SY, SZ = S
    one_pad = mont.one_mont(f, (NUM_WINDOWS, 1))
    SX = jnp.concatenate([SX[:, 1:], jnp.zeros((NUM_WINDOWS, 1, L), jnp.uint32)], axis=1)
    SY = jnp.concatenate([SY[:, 1:], one_pad], axis=1)
    SZ = jnp.concatenate([SZ[:, 1:], jnp.zeros((NUM_WINDOWS, 1, L), jnp.uint32)], axis=1)

    # shapes halve per level -> unrolled python loop (8 instantiations)
    T3 = (SX, SY, SZ)
    m_cur = NUM_BUCKETS
    while m_cur > 1:
        half = m_cur // 2
        a = tuple(t[:, :half] for t in T3)
        b = tuple(t[:, half : 2 * half] for t in T3)
        T3 = ec_add(spec, a, b)
        m_cur = half
    T = tuple(t[:, 0] for t in T3)  # (32, L) each

    # -- window join: R = sum_w 2^(8w) T_w, Horner from the top window ----
    R0 = tuple(t[NUM_WINDOWS - 1] for t in T)

    def join(i, R):
        w = NUM_WINDOWS - 2 - i
        R = jax.lax.fori_loop(0, WINDOW_BITS, lambda _, Q: ec_double(spec, Q), R)
        Tw = tuple(jax.lax.dynamic_index_in_dim(t, w, 0, keepdims=False) for t in T)
        return ec_add(spec, R, Tw)

    return jax.lax.fori_loop(0, NUM_WINDOWS - 1, join, R0)


def msm(points: jax.Array, scalars_mont: jax.Array, spec: CurveSpec = G1_SPEC):
    """Full MSM: device points (N,2,L) x Montgomery Fr scalars (N,16).

    Pads to a lane-friendly size and returns the projective result Point.
    """
    N = points.shape[0]
    scalars_std = mont.from_mont(BN254_FR, scalars_mont)
    n_pow = 1 << max((N - 1).bit_length(), 0) if N > 1 else 1
    lanes = min(16384, n_pow)
    pad = n_pow - N
    if pad:
        points = jnp.concatenate([points, jnp.zeros((pad, 2, L), jnp.uint32)], axis=0)
        scalars_std = jnp.concatenate(
            [scalars_std, jnp.zeros((pad, L), jnp.uint32)], axis=0
        )
    return msm_device(spec, points, scalars_std, lanes)


def msm_host(points: jax.Array, scalars_mont: jax.Array, spec: CurveSpec = G1_SPEC):
    """MSM returning a host affine point (or None)."""
    R = msm(points, scalars_mont, spec)
    return decode_points(spec, tuple(r[None] for r in R))[0]


@partial(jax.jit, static_argnums=(0, 3))
def _msm_many_device(spec: CurveSpec, points, scalars_std_batch, lanes: int):
    return jax.vmap(lambda s: msm_device(spec, points, s, lanes))(scalars_std_batch)


def msm_many_host(points: jax.Array, scalars_mont_list, spec: CurveSpec = G1_SPEC,
                  max_batch: int = 4):
    """Batch MSM: many scalar vectors against one point set (the prover's
    per-round multi-column commitments, SURVEY.md §2.3 "commit all advice
    columns as one batched MSM"). Returns host affine points."""
    if not scalars_mont_list:
        return []
    N = points.shape[0]
    n_pow = 1 << max((N - 1).bit_length(), 0) if N > 1 else 1
    lanes = min(16384, n_pow)
    pad = n_pow - N
    pts = points
    if pad:
        pts = jnp.concatenate([points, jnp.zeros((pad, 2, L), jnp.uint32)], axis=0)
    out = []
    for off in range(0, len(scalars_mont_list), max_batch):
        chunk = scalars_mont_list[off : off + max_batch]
        n_real = len(chunk)
        stds = []
        for s in chunk:
            std = mont.from_mont(BN254_FR, s)
            if pad or std.shape[0] < n_pow:
                std = jnp.concatenate(
                    [std, jnp.zeros((n_pow - std.shape[0], L), jnp.uint32)], axis=0
                )
            stds.append(std)
        # pad the batch to max_batch with zero scalars: ONE compiled shape
        # for every round's commitments instead of one per batch size
        while len(stds) < max_batch:
            stds.append(jnp.zeros((n_pow, L), jnp.uint32))
        batch = jnp.stack(stds)
        X, Y, Z = _msm_many_device(spec, pts, batch, lanes)
        out.extend(decode_points(spec, (X, Y, Z))[:n_real])
    return out
