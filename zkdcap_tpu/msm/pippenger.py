"""Pippenger multi-scalar multiplication on TPU.

TPU-native replacement for halo2's rayon Pippenger (SURVEY.md §2.3 row 1:
"bucket accumulation via sort/segment-sum (no scatter)"). This is THE hot
op of the prover: every polynomial commitment is one MSM
(`create_proof` steps 2-5/8, SURVEY.md §3.1).

Algorithm (signed c-bit windows, ceil(256/c) windows for 256-bit scalars):
  1. signed digit recoding: window digits in [-2^(c-1), 2^(c-1)-1], so only
     2^(c-1) buckets per window (point negation is one field negate),
  2. per window: the packed point rows RIDE the digit sort — an in-VMEM
     pallas bitonic sort (utils/device_sort.py) carries |digit| plus the
     8 X planes (then the 8 pre-negated Y planes) through every
     compare-exchange, so the sorted affine stream materialises with NO
     random-row gather (jnp.take's latency-bound gather was 57% of the
     round-4 MSM); windows larger than the sort's VMEM budget split into
     segments sorted independently,
  3. (fallback without the fused sort: lax.sort of (|d|, sign<<30|idx) +
     one packed row gather per point),
  4. lane-chunked segmented reduction: the sorted stream is split into G
     lanes of M points; each lane runs a sequential segmented scan (M
     steps of one wide mixed EC add, fused in a Pallas kernel; BN254's
     b3 = 9 multiplies as a digitwise small-mul + csubs),
  5. per-(window, segment) run partial sums (<= G_seg + 2^(c-1) run ends)
     are compacted via a single-operand bitonic end sort + K-row gather,
     then combined by a segmented Hillis-Steele scan whose level count is
     a data-dependent while_loop bound (ceil log2 of the longest
     same-digit run — typically 1-2 levels, not log2(G)),
  6. bucket totals land in dense 2^(c-1)-entry tables via unique-index
     scatter (per segment, EC-added across segments); classic suffix-sum
     aggregation (S += B_d; T += S) vectorised across all windows, then a
     Horner window join (c doublings/window).

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
    decode_points,
    ec_add,
    ec_double,
    ec_inf,
    ec_select,
)
from ..fields import BN254_FR, mont
from ..fields.params import NUM_LIMBS

import os as _os

# Window width c is tunable (8..16): fewer windows means fewer sorts,
# gathers and scan steps (all O(W*N)), more buckets means a longer
# compaction / suffix scan / tree reduce (O(W * 2^(c-1))). Measured on
# v5e (BENCH.md round 4): at 2^20 c=16 wins (697 ms vs 731 ms at c=13)
# but at 2^16 the bucket stages dominate and c=16 LOSES 1.8x — so the
# width is chosen per MSM size unless ZKDCAP_MSM_C pins it.
_ENV_C = _os.environ.get("ZKDCAP_MSM_C")
if _ENV_C is not None and not 8 <= int(_ENV_C) <= 16:
    # not assert: must survive `python -O`
    raise ValueError(
        f"ZKDCAP_MSM_C={_ENV_C} out of range [8, 16]: window digits "
        "must fit two 16-bit limbs")


def _auto_c(n: int) -> int:
    if _ENV_C is not None:
        return int(_ENV_C)
    return 16 if n >= (1 << 20) else 13


# Module-level view of the default width (scripts introspect these; the
# per-size choice inside msm_device takes precedence for large MSMs).
WINDOW_BITS = int(_ENV_C) if _ENV_C is not None else 13
NUM_WINDOWS = -(-256 // WINDOW_BITS)  # 20 windows of 13 bits
NUM_BUCKETS = 1 << (WINDOW_BITS - 1)  # signed digits: |d| in [0, 2^(c-1)]
L = NUM_LIMBS
_IDX_BITS = 30  # sign packs above the index in the sort payload


def _signed_digits(scalars_std: jax.Array, c: int = WINDOW_BITS) -> jax.Array:
    """uint32[N, 16] standard-form limbs -> int32[W, N] signed window digits.

    Signed recoding: raw c-bit windows plus a carry chain mapping each digit
    into [-2^(c-1), 2^(c-1)-1]. Scalars are < r < 2^254, so the top window
    never produces a carry out (digit <= 2^(254 - c*(W-1)) + 1 << 2^(c-1)).
    """
    n_windows = -(-256 // c)
    half = 1 << (c - 1)
    full = 1 << c
    mask = jnp.uint32(full - 1)
    raws = []
    for w in range(n_windows):
        bit = c * w
        li, r = bit // 16, bit % 16
        v = scalars_std[:, li] >> r
        if r + c > 16 and li + 1 < 16:
            v = v | (scalars_std[:, li + 1] << (16 - r))
        raws.append((v & mask).astype(jnp.int32))
    digits = []
    carry = jnp.zeros_like(raws[0])
    for w in range(n_windows):
        d = raws[w] + carry
        over = d >= half
        digits.append(jnp.where(over, d - full, d))
        carry = over.astype(jnp.int32)
    return jnp.stack(digits)


def _window_parallel(n_windows: int, lanes: int) -> int:
    """Largest divisor of n_windows keeping the merged scan width bounded.

    The segmented scan materialises (M, L, WP*lanes) in/out arrays; capping
    WP*lanes at 128k lanes bounds that at ~4 GB for 2^20 points so batched
    (vmapped) commitments stay inside HBM."""
    budget = 131072
    for wp in range(min(10, n_windows), 0, -1):
        if n_windows % wp == 0 and wp * lanes <= budget:
            return wp
    return 1


# Point counts at or below this use the double-and-add ladder: the full
# Pippenger program (sorts, scans, pallas kernels) costs MINUTES of XLA
# compile per shape on the CPU backend, while the ladder is a tiny
# fori_loop that compiles in seconds and is plenty fast at these sizes.
# (The prover's real commitments are 2^17..2^18 points; tiny MSMs appear
# only in tests, toy circuits, and the multiopen's final combine.)
SMALL_MSM_MAX = 512


@partial(jax.jit, static_argnums=(0,))
def msm_ladder(spec: CurveSpec, points: jax.Array, scalars_std: jax.Array):
    """O(256·N) double-and-add MSM for small N: per bit, a masked log-depth
    tree sum of the points, Horner-accumulated over the 256 scalar bits.
    Exact same group element as msm_device (complete formulas throughout)."""
    f = spec.field
    N = points.shape[0]
    npad = max(1 << (N - 1).bit_length(), 1) if N > 1 else 1
    Px, Py = points[:, 0], points[:, 1]
    pt_inf = jnp.logical_and(mont.is_zero(Px), mont.is_zero(Py))
    one = mont.one_mont(f, (N,))
    Py = jnp.where(pt_inf[:, None], one, Py)
    Pz = jnp.where(pt_inf[:, None], jnp.zeros_like(one), one)
    if npad != N:
        inf = ec_inf(spec, (npad - N,))
        Px = jnp.concatenate([Px, inf[0]])
        Py = jnp.concatenate([Py, inf[1]])
        Pz = jnp.concatenate([Pz, inf[2]])
        scalars_std = jnp.concatenate(
            [scalars_std, jnp.zeros((npad - N, L), jnp.uint32)]
        )

    def step(t, acc):
        j = 255 - t  # MSB first
        acc = ec_double(spec, acc)
        limb = jnp.take(scalars_std, j // 16, axis=1)  # (npad, L) -> (npad,)
        bit = (limb >> (j % 16).astype(jnp.uint32)) & 1
        sub = ec_select(bit.astype(bool), (Px, Py, Pz), ec_inf(spec, (npad,)))
        m = npad
        while m > 1:
            half = m // 2
            sub = ec_add(
                spec,
                tuple(c[:half] for c in sub),
                tuple(c[half : 2 * half] for c in sub),
            )
            m = half
        return ec_add(spec, acc, tuple(c[0] for c in sub))

    return jax.lax.fori_loop(0, 256, step, ec_inf(spec))


@partial(jax.jit, static_argnums=(0, 3, 4))
def msm_device(spec: CurveSpec, points: jax.Array, scalars_std: jax.Array,
               lanes: int, c: int = 0):
    """points: uint32[N,2,L] Montgomery affine ((0,0)=inf); scalars_std:
    uint32[N,16] standard form. N must be a multiple of `lanes`.
    c: signed-window width (0 = size-tuned default, see _auto_c).
    Returns a single projective Point."""
    f = spec.field
    N = points.shape[0]
    c = c or _auto_c(N)
    NUM_WINDOWS = -(-256 // c)
    NUM_BUCKETS = 1 << (c - 1)
    WINDOW_BITS = c
    G = lanes
    M = N // G
    assert G * M == N

    digits = _signed_digits(scalars_std, c)  # (W, N) signed

    idxN = jnp.arange(N, dtype=jnp.int32)
    WP = _window_parallel(NUM_WINDOWS, G)
    from ..curves.ec_kernels import (
        BLOCK as EC_BLOCK, _fold_sub, ec_add_select, pack_affine_rows)
    from ..utils.device_sort import (
        ROWS_SORT_SEG, bitonic_sort, sort_rows_by_key, sort_supported)

    # _fold_sub > 0: the scan kernel needs a Mosaic-legal VMEM fold of the
    # (WP*G)-wide stream (reachable only via non-default ZKDCAP_MSM_C/lanes).
    # ZKDCAP_MSM_FORCE_LM=1 runs the kernel path in interpret mode off-TPU
    # (slow; only for small-N correctness tests of the fused-sort pipeline).
    force_lm = _os.environ.get("ZKDCAP_MSM_FORCE_LM") == "1"
    use_lm = ((WP * G) % EC_BLOCK == 0 and _fold_sub(WP * G) > 0
              and (jax.default_backend() == "tpu" or force_lm))
    # Fused digit+row sort: the bitonic kernel carries the packed point
    # planes with the digits, so the sorted stream needs NO per-point row
    # gather (411 ms of the 716 ms 2^20 MSM was jnp.take's random-row
    # gather). N > ROWS_SORT_SEG splits each window into VMEM-sized
    # segments sorted independently; the tail then compacts/merges/deposits
    # per segment and EC-adds the S bucket tables at the end.
    S = max(N // ROWS_SORT_SEG, 1)
    use_rows_sort = (
        use_lm and sort_supported(min(N, ROWS_SORT_SEG), n_ops=9)
        and N % min(N, ROWS_SORT_SEG) == 0 and G % S == 0 and G // S >= 1
        and _os.environ.get("ZKDCAP_MSM_ROWSORT", "0") == "1"
    )
    if not use_rows_sort:
        S = 1
    n_seg = N // S
    G_seg = G // S  # lanes per (window, segment)
    K = min(n_seg, G_seg + NUM_BUCKETS)  # run-end bound per (window, segment)
    idxK = jnp.arange(K, dtype=jnp.int32)
    idxS = jnp.arange(n_seg, dtype=jnp.int32)
    if use_lm:
        # u16-packed rows: the sorted-point gather is row-latency-bound, so
        # 64 B rows gather ~2x faster than 128 B ones; the scan kernel
        # unpacks (and applies the sign) in VMEM for free
        rows = pack_affine_rows(points)  # (N, L)
    else:
        rows = points.reshape(N, 2 * L)  # X ‖ Y unpacked per point
    if use_rows_sort:
        rows_pm = rows.T  # (L, N) plane-major for the fused sort
        rows_zero = jnp.all(rows == 0, axis=-1)  # encoded infinities

    # In-VMEM pallas bitonic sorts replace lax.sort (whose TPU lowering
    # runs every compare-exchange pass through HBM). Not stable, so the
    # run-end sort packs the index into the key; the digit sort's tie
    # order only permutes points within a bucket — the summed group
    # element (and therefore the proof bytes) is unchanged.
    # Bitonic sorts / fused rows-sort: measured on v5e, the in-VMEM
    # bitonic kernel runs ~10x below its op-count estimate (sublane-axis
    # exchanges lower to expensive relayouts; sub-8-row rotates worst) and
    # Mosaic compiles of the 200-stage kernels take 25+ minutes per shape,
    # so both stay OPT-IN experiments (ZKDCAP_MSM_BITONIC=1 /
    # ZKDCAP_MSM_ROWSORT=1). The production path keeps lax.sort + the
    # packed-row gather; the while-bounded HS and cheap-b3 wins stand.
    bitonic_ok = _os.environ.get("ZKDCAP_MSM_BITONIC", "0") == "1"
    use_bitonic = use_lm and sort_supported(N) and bitonic_ok

    def digit_sort(d_grp):
        # (WP, N) signed digits -> sorted (|d|, sign<<30|index) per window
        key = jnp.abs(d_grp).astype(jnp.uint32)
        payload = jnp.where(
            d_grp < 0, idxN[None] | (1 << _IDX_BITS), idxN[None]
        ).astype(jnp.uint32)
        payload = jnp.broadcast_to(payload, key.shape)
        if use_bitonic:
            return bitonic_sort((key, payload))
        return jax.vmap(
            lambda k, p: jax.lax.sort((k, p), num_keys=1)
        )(key, payload)

    def sort_part(skey, sp):
        # -- stage 3: one packed row gather per sorted point ---------------
        order = (sp & ((1 << _IDX_BITS) - 1)).astype(jnp.int32)
        neg_mask = sp >> _IDX_BITS
        g = jnp.take(rows, order, axis=0)
        pt_inf = jnp.all(g == 0, axis=-1)
        d = skey.astype(jnp.int32)
        valid = jnp.logical_and(d != 0, jnp.logical_not(pt_inf))
        if use_lm:
            return g, (neg_mask == 1), valid, d
        X, Y = g[:, :L], g[:, L:]
        Y = jnp.where((neg_mask == 1)[:, None], mont.neg(f, Y), Y)
        return X, Y, valid, d

    use_bitonic_ends = use_lm and sort_supported(n_seg) and bitonic_ok

    def run_end_indices(d_all):
        # -- stage 5a: compact run-end positions, batched over the
        # (window, segment) rows. Bitonic path: ONE u32 key (end-flag above
        # the local index) sorts ends first in stream order — the packed
        # index restores stability.
        is_lane_end = (idxS % M) == (M - 1)
        d_next = jnp.concatenate(
            [d_all[:, 1:], jnp.full((d_all.shape[0], 1), -1, jnp.int32)],
            axis=1,
        )
        is_end = jnp.logical_or(is_lane_end[None, :], d_all != d_next)
        n_ends = jnp.sum(is_end.astype(jnp.int32), axis=1)
        notend = jnp.logical_not(is_end).astype(jnp.uint32)
        if use_bitonic_ends:
            key = (notend << _IDX_BITS) | idxS.astype(jnp.uint32)[None]
            (skey,) = bitonic_sort((key,))
            cidx = (skey & ((1 << _IDX_BITS) - 1)).astype(jnp.int32)
        else:
            _, cidx = jax.vmap(
                lambda ne: jax.lax.sort((ne, idxS), num_keys=1)
            )(notend)
        return cidx[:, :K], n_ends

    def neg_packed_y(y_pm, sign):
        # y_pm (8, N) u16-packed Montgomery Y planes; sign (WP, N) bool.
        # Returns (WP, 8, N): p - y where sign (one borrow chain; y < p so
        # no net borrow; y = 0 maps to p, but those rows are encoded
        # infinities whose key is 0 — never selected by the scan).
        limbs = []
        for j in range(8):
            v = y_pm[j]
            limbs.append((v & jnp.uint32(0xFFFF)).astype(jnp.int32))
            limbs.append((v >> 16).astype(jnp.int32))
        p_l = [int(v) for v in f.p_limbs]
        neg = []
        bw = jnp.zeros_like(limbs[0])
        for k2 in range(2 * 8):
            t = jnp.int32(p_l[k2]) - limbs[k2] - bw
            neg.append(t & jnp.int32(0xFFFF))
            bw = (t >> 16) & 1
        nplanes = [
            (neg[2 * j] | (neg[2 * j + 1] << 16)).astype(jnp.uint32)
            for j in range(8)
        ]
        out = jnp.stack(nplanes)  # (8, N)
        return jnp.where(sign[:, None, :], out[None], y_pm[None])

    def compact_part(sX, sY, sZ, d, cidx, n_ends):
        dead = idxK >= n_ends
        vd = jnp.where(dead, 0, jnp.take(d, cidx))
        vX = jnp.take(sX, cidx, axis=0)
        vY = jnp.take(sY, cidx, axis=0)
        vZ = jnp.take(sZ, cidx, axis=0)
        one_k = mont.one_mont(f, (K,))
        deadc = jnp.logical_or(dead, vd == 0)
        vX = jnp.where(deadc[:, None], 0, vX)
        vY = jnp.where(deadc[:, None], one_k, vY)
        vZ = jnp.where(deadc[:, None], 0, vZ)
        vd = jnp.where(deadc, 0, vd)
        return vX, vY, vZ, vd

    def deposit_part(cX, cY, cZ, vd):
        # -- stage 6a: deposit group totals into dense buckets -------------
        # bucket b (1..NUM_BUCKETS) lives at slot b-1; invalids -> dump slot
        vd_next = jnp.concatenate([vd[1:], jnp.full((1,), -1, jnp.int32)])
        is_last = vd != vd_next
        slot = jnp.where(jnp.logical_and(is_last, vd > 0), vd - 1, NUM_BUCKETS)
        bX = jnp.zeros((NUM_BUCKETS + 1, L), jnp.uint32).at[slot].set(cX)[:NUM_BUCKETS]
        bY = jnp.concatenate(
            [jnp.broadcast_to(mont.one_mont(f, (NUM_BUCKETS,)), (NUM_BUCKETS, L)),
             jnp.zeros((1, L), jnp.uint32)], axis=0
        ).at[slot].set(cY)[:NUM_BUCKETS]
        bZ = jnp.zeros((NUM_BUCKETS + 1, L), jnp.uint32).at[slot].set(cZ)[:NUM_BUCKETS]
        return bX, bY, bZ

    from ..curves.ec_kernels import ec_add_select as _eas_t

    def tree_sum(T3, m, axis):
        # pairwise halving over `axis` through the fused complete-add kernel
        while m > 1:
            half = m // 2
            a = tuple(jax.lax.slice_in_dim(t, 0, half, axis=axis) for t in T3)
            b = tuple(
                jax.lax.slice_in_dim(t, half, 2 * half, axis=axis) for t in T3
            )
            sh = a[0].shape
            ones = jnp.ones((a[0].size // L,), jnp.uint32)
            s = _eas_t(
                spec,
                tuple(x.reshape(-1, L) for x in a),
                tuple(x.reshape(-1, L) for x in b),
                ones,
                fallback="p",
            )
            T3 = tuple(x.reshape(sh) for x in s)
            m = half
        return tuple(jnp.squeeze(t, axis=axis) for t in T3)

    def group_fn(d_grp):
        # (WP, N) digits -> (WP, NUM_BUCKETS) buckets. The EC-heavy stages
        # run on merged (WP*G) lanes through the fused pallas add kernels.
        B = WP * G
        from ..curves.ec_kernels import ec_add_select_lm, ec_madd_scan_full

        def to_mlb(A):  # (WP, N, L) -> (M, L, B)
            return A.reshape(WP, G, M, L).transpose(2, 3, 0, 1).reshape(M, L, B)

        def to_mb(A):  # (WP, N) -> (M, B)
            return A.reshape(WP, G, M).transpose(2, 0, 1).reshape(M, B)

        # -- stage 4: per-lane segmented scan (kernelized mixed EC adds) ---
        # (M, L, B) layout, B = WP*G merged lanes: each step j reads a
        # CONTIGUOUS (L, B) limb-major block and feeds the fused pallas
        # MIXED-add kernel (the sorted stream is affine, Z2 = 1: one fewer
        # multiply, no Z plane in HBM, validity folded into the select).
        one_b = mont.one_mont(f, (1,))[0]
        if use_rows_sort:
            # -- fused digit+row sort: no gather anywhere ------------------
            key = jnp.where(
                rows_zero[None], jnp.uint32(0),
                jnp.abs(d_grp).astype(jnp.uint32),
            )  # 0 = invalid (digit 0 or infinity), matching the scan gate
            skey, sx = sort_rows_by_key(key, rows_pm[:8], per_window=False)
            y_neg = neg_packed_y(rows_pm[8:], d_grp < 0)  # (WP, 8, N)
            _, sy = sort_rows_by_key(key, y_neg, per_window=True)
            d = skey.astype(jnp.int32)  # (WP, N) sorted |digit|
            valid = skey != 0
            Ppm = jnp.concatenate([sx, sy], axis=1)  # (WP, L, N) plane-major
            Pm = (Ppm.reshape(WP, L, G, M).transpose(3, 1, 0, 2)
                  .reshape(M, L, B))
            dm = to_mb(d)
            sames = jnp.concatenate(
                [jnp.zeros((1, B), jnp.uint32),
                 (dm[1:] == dm[:-1]).astype(jnp.uint32)], axis=0
            )
            # Y is pre-negated inside the sorted stream: negate-Y mask = 0,
            # keeping the scan kernel (and its compiled program) unchanged
            masks = jnp.stack(
                [sames, to_mb(valid).astype(jnp.uint32),
                 jnp.zeros((M, B), jnp.uint32)], axis=1
            )  # (M, 3, B)
            oX, oY, oZ = ec_madd_scan_full(spec, Pm, masks)
        elif use_lm:
            skeys, sps = digit_sort(d_grp)
            Ps, negs, valid, d = jax.vmap(sort_part)(skeys, sps)  # (WP,N,L)
            Pm = to_mlb(Ps)
            dm = to_mb(d)
            sames = jnp.concatenate(
                [jnp.zeros((1, B), jnp.uint32),
                 (dm[1:] == dm[:-1]).astype(jnp.uint32)], axis=0
            )
            masks = jnp.stack(
                [sames, to_mb(valid).astype(jnp.uint32),
                 to_mb(negs).astype(jnp.uint32)], axis=1
            )  # (M, 3, B)
            # whole scan in ONE kernel: acc lives in VMEM scratch across the
            # M grid steps (no per-step launch / acc HBM round-trips)
            oX, oY, oZ = ec_madd_scan_full(spec, Pm, masks)
        else:
            skeys, sps = digit_sort(d_grp)
            Xs, Ys, valid, d = jax.vmap(sort_part)(skeys, sps)
            Xm, Ym = to_mlb(Xs), to_mlb(Ys)
            dm = to_mb(d)
            validm = to_mb(valid)
            sames = jnp.concatenate(
                [jnp.zeros((1, B), jnp.uint32),
                 (dm[1:] == dm[:-1]).astype(jnp.uint32)], axis=0
            )
            masks = jnp.stack(
                [sames, validm.astype(jnp.uint32)], axis=1
            )  # (M, 2, B)
            out0 = jnp.zeros((M, L, B), jnp.uint32)
            iX = jnp.zeros((L, B), jnp.uint32)
            iY = jnp.broadcast_to(one_b[:, None], (L, B))
            iZ = jnp.zeros((L, B), jnp.uint32)

            def step(j, carry):
                (aX, aY, aZ), (oX, oY, oZ) = carry
                Qj = tuple(
                    jax.lax.dynamic_index_in_dim(arr, j, 0, keepdims=False)
                    for arr in (Xm, Ym)
                )
                m2 = jax.lax.dynamic_index_in_dim(masks, j, 0, keepdims=False)
                # jnp fallback: projective Q with validity pre-masked
                ok = m2[1] > 0
                one_row = jnp.broadcast_to(one_b[:, None], Qj[0].shape)
                Qp = (
                    jnp.where(ok[None, :], Qj[0], 0),
                    jnp.where(ok[None, :], Qj[1], one_row),
                    jnp.where(ok[None, :], one_row, 0),
                )
                rm = ec_add_select(
                    spec,
                    tuple(c.T for c in (aX, aY, aZ)),
                    tuple(c.T for c in Qp),
                    m2[0],
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

        # The tail (compact / Hillis-Steele / deposit) works per
        # (window, segment): each segment is independently digit-sorted, so
        # same-digit partials are contiguous only WITHIN a segment. WS rows
        # of n_seg elements; the S bucket tables merge at the end (S = 1
        # off the rows-sort path — everything below then matches the
        # original whole-window tail).
        WS = WP * S
        sX = from_mlb(oX).reshape(WS, n_seg, L)
        sY = from_mlb(oY).reshape(WS, n_seg, L)
        sZ = from_mlb(oZ).reshape(WS, n_seg, L)
        d_seg = d.reshape(WS, n_seg)

        cidx_all, n_ends_all = run_end_indices(d_seg)
        vX, vY, vZ, vd = jax.vmap(compact_part)(
            sX, sY, sZ, d_seg, cidx_all, n_ends_all
        )  # (WS, K, ...)

        # -- stage 5b: segmented Hillis-Steele on merged lanes (limb-major:
        # one layout transpose total instead of nine per level). Same-digit
        # entries are CONTIGUOUS in the compact array and a digit has at
        # most one partial per lane it spans, so ceil(log2(G)) levels close
        # every group — not log2(K).
        BK = WS * K
        from ..curves.ec_kernels import _fold_sub

        use_lm_hs = (
            BK % EC_BLOCK == 0
            and _fold_sub(BK) > 0
            and jax.default_backend() == "tpu"
        )
        cX = vX.transpose(2, 0, 1)  # (L, WS, K)
        cY = vY.transpose(2, 0, 1)
        cZ = vZ.transpose(2, 0, 1)
        padc = jnp.zeros((L, WS, K), jnp.uint32)
        pad1 = jnp.broadcast_to(one_b[:, None, None], (L, WS, K))
        padd = jnp.zeros((WS, K), jnp.int32)
        idxK2 = jnp.arange(K, dtype=jnp.int32)
        n_levels = max(min((K - 1).bit_length(), (G_seg - 1).bit_length()), 1)
        # Levels actually needed: ceil(log2(longest same-digit run)). A
        # digit has one compact partial per lane it spanned, so typical
        # runs are 1-2 entries (N/NUM_BUCKETS points per bucket vs M per
        # lane) and 2 levels close every group; the static n_levels bound
        # only materialises for adversarial scalar distributions. Levels
        # with shift >= the longest run are exact no-ops (no pair passes
        # the pds == vd gate), so gating the loop on the measured run
        # length is RESULT-identical — proofs do not change.
        nz = vd != 0
        change = jnp.concatenate(
            [jnp.ones((WS, 1), jnp.bool_), vd[:, 1:] != vd[:, :-1]], axis=1
        )
        run_start = jnp.logical_or(change, jnp.logical_not(nz))
        pos = jnp.broadcast_to(idxK2[None, :], (WS, K))
        start_pos = jax.lax.cummax(jnp.where(run_start, pos, 0), axis=1)
        max_run = jnp.max(jnp.where(nz, pos - start_pos + 1, 0))
        lvl_needed = jnp.sum(
            (max_run > (1 << jnp.arange(n_levels, dtype=jnp.int32))).astype(
                jnp.int32
            )
        )

        def level(carry):
            s, cX, cY, cZ = carry
            shift = jnp.left_shift(jnp.int32(1), s)
            start = K - shift

            def shifted(arr, pad):
                big = jnp.concatenate([pad, arr], axis=-1)
                return jax.lax.dynamic_slice_in_dim(big, start, K, axis=-1)

            pXs = shifted(cX, padc)
            pYs = shifted(cY, pad1)
            pZs = shifted(cZ, padc)
            pds = shifted(vd, padd)
            ok = jnp.logical_and(idxK2[None, :] >= shift, pds == vd)
            ok = jnp.logical_and(ok, vd != 0)
            P3 = tuple(c.reshape(L, BK) for c in (cX, cY, cZ))
            Q3 = tuple(c.reshape(L, BK) for c in (pXs, pYs, pZs))
            if use_lm_hs:
                new = ec_add_select_lm(
                    spec, P3, Q3, ok.reshape(1, BK).astype(jnp.uint32),
                    fallback="p",
                )
            else:
                rm = ec_add_select(
                    spec,
                    tuple(c.T for c in P3),
                    tuple(c.T for c in Q3),
                    ok.reshape(BK),
                    fallback="p",
                )
                new = tuple(c.T for c in rm)
            return (s + 1,) + tuple(c.reshape(L, WS, K) for c in new)

        if (jax.default_backend() == "tpu"
                and _os.environ.get("ZKDCAP_MSM_WHILE_HS", "1") != "0"):
            _, cX, cY, cZ = jax.lax.while_loop(
                lambda c: c[0] < lvl_needed, level, (jnp.int32(0), cX, cY, cZ)
            )
        else:
            # while_loop explodes XLA:CPU compile time on the multi-device
            # mesh path (observed 70+ min for the 8-virtual-device suite
            # test); the static-level fori compiles fine and the extra
            # levels are exact no-ops, so results are identical.
            _, cX, cY, cZ = jax.lax.fori_loop(
                0, n_levels, lambda i, c: level(c), (jnp.int32(0), cX, cY, cZ)
            )
        cX, cY, cZ = (c.transpose(1, 2, 0) for c in (cX, cY, cZ))
        tX, tY, tZ = jax.vmap(deposit_part)(cX, cY, cZ, vd)  # (WS, NB, L)
        if S > 1:
            # EC-add the S per-segment bucket tables of every window
            T3 = tuple(
                t.reshape(WP, S, NUM_BUCKETS, L) for t in (tX, tY, tZ)
            )
            tX, tY, tZ = tree_sum(T3, S, axis=1)
        return tX, tY, tZ

    dgroups = digits.reshape(NUM_WINDOWS // WP, WP, N)
    bX, bY, bZ = jax.lax.map(group_fn, dgroups)
    bX = bX.reshape(NUM_WINDOWS, NUM_BUCKETS, L)
    bY = bY.reshape(NUM_WINDOWS, NUM_BUCKETS, L)
    bZ = bZ.reshape(NUM_WINDOWS, NUM_BUCKETS, L)

    # -- stage 6b: aggregation sum_i (i+1)*B_i (slot i holds bucket i+1) in
    # SPLIT-WEIGHT form. Write i = hi*2^H + lo; then
    #   sum_i (i+1) B_i = 2^H * sum_hi hi*C_hi  +  sum_lo (lo+1)*D_lo
    # with C_hi = sum_lo B[hi,lo] and D_lo = sum_hi B[hi,lo]. Cost: two
    # kernel tree reductions (~2*NB adds/window) + two suffix scans over
    # ~sqrt(NB) lanes + H doublings — ~6x fewer EC adds than the former
    # full-width Hillis-Steele suffix + jnp tree reduce over all NB slots.
    from ..curves.ec_kernels import ec_add_select as _eas

    HSPLIT = (WINDOW_BITS - 1) // 2
    lo_n = 1 << HSPLIT
    hi_n = NUM_BUCKETS >> HSPLIT

    def suffix_scan(T3, m):
        # Hillis-Steele suffix sums along axis 1 of (W, m, L) coords
        idx = jnp.arange(m, dtype=jnp.int32)

        def level(s, carry):
            cX, cY, cZ = carry
            shift = jnp.left_shift(jnp.int32(1), s)
            nX = jnp.roll(cX, -shift, axis=1)
            nY = jnp.roll(cY, -shift, axis=1)
            nZ = jnp.roll(cZ, -shift, axis=1)
            valid = (idx + shift) < m
            vb = jnp.broadcast_to(valid[None, :], cX.shape[:2])
            new = _eas(
                spec,
                tuple(c.reshape(-1, L) for c in (cX, cY, cZ)),
                tuple(c.reshape(-1, L) for c in (nX, nY, nZ)),
                vb.reshape(-1).astype(jnp.uint32),
                fallback="p",
            )
            return tuple(c.reshape(cX.shape) for c in new)

        n_lev = max((m - 1).bit_length(), 1)
        return jax.lax.fori_loop(0, n_lev, level, T3)

    def mask_slot0(T3):
        # slot 0 -> projective identity (its weight term is hi=0)
        X, Y, Z = T3
        is0 = (jnp.arange(X.shape[1]) == 0)[None, :, None]
        one_row = mont.one_mont(f, (1,))[0][None, None, :]
        return (
            jnp.where(is0, 0, X),
            jnp.where(is0, jnp.broadcast_to(one_row, Y.shape), Y),
            jnp.where(is0, 0, Z),
        )

    B4 = tuple(
        b.reshape(NUM_WINDOWS, hi_n, lo_n, L) for b in (bX, bY, bZ)
    )
    C3 = tree_sum(B4, lo_n, axis=2)  # (W, hi_n, L): row sums over lo
    D3 = tree_sum(B4, hi_n, axis=1)  # (W, lo_n, L): col sums over hi
    A3 = tree_sum(mask_slot0(suffix_scan(C3, hi_n)), hi_n, axis=1)  # (W, L)
    B3 = tree_sum(suffix_scan(D3, lo_n), lo_n, axis=1)  # (W, L)
    for _ in range(HSPLIT):
        A3 = ec_double(spec, A3)
    T = ec_add(spec, A3, B3)  # (W, L) each

    # -- window join: R = sum_w 2^(c*w) T_w --------------------------------
    if jax.default_backend() == "tpu":
        # fused kernel: masked parallel doublings + sublane roll-tree
        from ..curves.ec_kernels import ec_window_join

        return ec_window_join(spec, T, WINDOW_BITS)

    # jnp fallback (CPU tests): Horner from the top window
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
    if N <= SMALL_MSM_MAX:
        return msm_ladder(spec, points, scalars_std)
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
    if points.shape[0] <= SMALL_MSM_MAX:
        return jax.vmap(lambda s: msm_ladder(spec, points, s))(scalars_std_batch)
    return jax.vmap(lambda s: msm_device(spec, points, s, lanes))(scalars_std_batch)


def msm_many_host(points: jax.Array, scalars_mont_list, spec: CurveSpec = G1_SPEC,
                  max_batch: int | None = None):
    """Batch MSM: many scalar vectors against one point set (the prover's
    per-round multi-column commitments, SURVEY.md §2.3 "commit all advice
    columns as one batched MSM"). Returns host affine points.

    max_batch = columns vmapped per launch (fixed-point padding keeps one
    compiled shape per round); ZKDCAP_MSM_BATCH overrides for tuning."""
    if max_batch is None:
        import os

        max_batch = int(os.environ.get("ZKDCAP_MSM_BATCH", "4"))
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
