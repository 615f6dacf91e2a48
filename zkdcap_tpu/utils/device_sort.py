"""Pallas TPU kernel: in-VMEM bitonic sort of (key, payload) u32 arrays.

XLA's `lax.sort` on TPU runs its compare-exchange passes through HBM; for
the MSM's per-window digit sorts (N = 2^17..2^20, the dominant data
movement of the Pippenger pipeline — SURVEY.md §2.3 row 1) that is ~100x
more traffic than the array size. This kernel keeps the whole array
VMEM-resident and runs all log2(N)*(log2(N)+1)/2 bitonic stages in one
pallas_call.

The TPU-native trick: a bitonic stage exchanges element j with j XOR d
(d a power of two). XOR by d never crosses a power-of-two boundary larger
than d, so with the array laid out as (rows, 128):
  * d < 128: the partner lives in the SAME row — two lane-rolls + a
    per-lane select produce the partner vector (the wrapped lanes are
    never selected);
  * d >= 128: the partner lives in the same lane of row (r XOR d/128) —
    the same trick on the sublane axis.
No gathers, no HBM round trips, ~10 vector ops per element per stage.

Batched: the grid dimension sorts many independent arrays (the MSM's W
windows) sequentially while each stays resident.

Not a stable sort: equal keys keep their original relative values only by
the deterministic tie rule (ties never swap), which is order-dependent.
Callers needing stability must disambiguate keys (pack the index into the
key's low bits).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
LOG_LANE = 7


def _mk_sort_kernel(log_n: int, n_ops: int):
    n = 1 << log_n
    rows = n // LANE

    def kernel(*refs):
        ins = refs[:n_ops]
        outs = refs[n_ops:]
        vs = [r[...] for r in ins]
        row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)

        def exchange(vs, is_lower, asc, partner):
            pk = partner(vs[0])
            want_min = is_lower == asc
            k0 = vs[0]
            # deterministic tie rule: equal keys never swap. The selected
            # operands stay u32 (Mosaic rejects select over i1 vectors:
            # "unsupported target bitwidth for truncation").
            lt = (pk < k0).astype(jnp.uint32)
            gt = (pk > k0).astype(jnp.uint32)
            take = jnp.where(want_min, lt, gt) > 0
            new = [jnp.where(take, pk, k0)]
            for v in vs[1:]:
                new.append(jnp.where(take, partner(v), v))
            return new

        for k in range(1, log_n + 1):
            # ascending blocks where bit k of the flat index is 0
            if k < LOG_LANE:
                asc = ((lane_i >> k) & 1) == 0
            else:
                asc = ((row_i >> (k - LOG_LANE)) & 1) == 0
            for dl in range(k - 1, -1, -1):
                d = 1 << dl
                if d < LANE:
                    is_lower = ((lane_i >> dl) & 1) == 0

                    def partner(v, d=d, is_lower=is_lower):
                        up = pltpu.roll(v, LANE - d, 1)
                        dn = pltpu.roll(v, d, 1)
                        return jnp.where(is_lower, up, dn)
                else:
                    # Row-regime pass: the partner lives rd rows away.
                    # Static slice+concat rotates — sublane-axis
                    # pltpu.roll is what hung the Mosaic remote compiles.
                    rd = d // LANE
                    is_lower = ((row_i >> (dl - LOG_LANE)) & 1) == 0

                    def partner(v, rd=rd, is_lower=is_lower):
                        up = jnp.concatenate([v[rd:], v[:rd]], axis=0)
                        dn = jnp.concatenate([v[rows - rd:], v[:rows - rd]],
                                             axis=0)
                        return jnp.where(is_lower, up, dn)

                vs = exchange(vs, is_lower, asc, partner)

        for o, v in zip(outs, vs):
            o[...] = v

    return kernel


@functools.cache
def _sort_call(log_n: int, n_ops: int, batch: int, interpret: bool):
    n = 1 << log_n
    rows = n // LANE
    kernel = _mk_sort_kernel(log_n, n_ops)
    spec = pl.BlockSpec((1, rows, LANE), lambda b: (b, 0, 0))
    kwargs = {}
    if not interpret and rows * LANE * 4 * n_ops > 4 * 1024 * 1024:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)

    def body(*refs):
        # drop the leading batch dim of every block
        sliced = [r.at[0] for r in refs]
        kernel(*sliced)

    call = pl.pallas_call(
        body,
        out_shape=tuple(
            jax.ShapeDtypeStruct((batch, rows, LANE), jnp.uint32)
            for _ in range(n_ops)
        ),
        grid=(batch,),
        in_specs=[spec] * n_ops,
        out_specs=tuple(spec for _ in range(n_ops)),
        interpret=interpret,
        **kwargs,
    )
    return call


# VMEM holds in+out+temporaries; cap the resident size (per operand plane:
# 4 B * N in + out). 2^21 x 2 planes = 32 MB resident — comfortably inside
# the 100 MB cap; 2^22 two-operand would be 64 MB + temps, still OK but
# matches nothing the prover sorts today.
MAX_LOG_N = 21
MIN_LOG_N = 10  # need >= 8 rows of 128 lanes for a legal (8, 128) tile


def sort_supported(n: int, n_ops: int = 2) -> bool:
    if n & (n - 1):
        return False
    log_n = n.bit_length() - 1
    if not MIN_LOG_N <= log_n <= MAX_LOG_N:
        return False
    return 4 * n * 2 * n_ops < 90 * 1024 * 1024


@functools.cache
def _rows_sort_call(log_n: int, n_planes: int, n_w: int, n_seg: int,
                    shared: bool, interpret: bool):
    """pallas_call sorting, for every (window w, segment s), the u32 key
    block key[w, s] together with n_planes row planes — planes[s] when
    `shared` (every window re-reads the same segment of the point table:
    a sequential DMA, NOT a gather) or planes[w, s] otherwise."""
    n = 1 << log_n
    rows = n // LANE
    kernel = _mk_sort_kernel(log_n, 1 + n_planes)
    key_spec = pl.BlockSpec((1, 1, rows, LANE), lambda w, s: (w, s, 0, 0))
    if shared:
        plane_spec = pl.BlockSpec(
            (1, n_planes, rows, LANE), lambda w, s: (s, 0, 0, 0))
    else:
        plane_spec = pl.BlockSpec(
            (1, 1, n_planes, rows, LANE), lambda w, s: (w, s, 0, 0, 0))
    out_key_spec = pl.BlockSpec((1, 1, rows, LANE), lambda w, s: (w, s, 0, 0))
    out_plane_spec = pl.BlockSpec(
        (1, 1, n_planes, rows, LANE), lambda w, s: (w, s, 0, 0, 0))

    def body(key_ref, planes_ref, out_key_ref, out_planes_ref):
        kr = key_ref.at[0, 0]
        if shared:
            prs = [planes_ref.at[0, i] for i in range(n_planes)]
        else:
            prs = [planes_ref.at[0, 0, i] for i in range(n_planes)]
        okr = out_key_ref.at[0, 0]
        oprs = [out_planes_ref.at[0, 0, i] for i in range(n_planes)]
        kernel(kr, *prs, okr, *oprs)

    return pl.pallas_call(
        body,
        out_shape=(
            jax.ShapeDtypeStruct((n_w, n_seg, rows, LANE), jnp.uint32),
            jax.ShapeDtypeStruct((n_w, n_seg, n_planes, rows, LANE),
                                 jnp.uint32),
        ),
        grid=(n_w, n_seg),
        in_specs=[key_spec, plane_spec],
        out_specs=(out_key_spec, out_plane_spec),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )


# Per-(window, segment) VMEM residency: (1 key + 8 planes) x (in + out)
# x double buffering at 4 B/elem — 2^18 keeps it ~40 MB.
ROWS_SORT_SEG = 1 << 18


def sort_rows_by_key(key, planes, per_window: bool,
                     interpret: bool | None = None):
    """Batched fused digit+row sort: key (W, N) u32; planes PLANE-MAJOR
    (P, N) u32 shared by every window, or (W, P, N) when per_window
    (plane-major keeps every reshape here minor-dim-preserving — no
    relayout). Splits N into ROWS_SORT_SEG segments sorted independently
    (callers handle the segment-local grouping). Returns
    (sorted_key (W, N), sorted_planes (W, P, N))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_w, n = key.shape
    n_seg = max(n // ROWS_SORT_SEG, 1)
    seg = n // n_seg
    log_seg = seg.bit_length() - 1
    rows = seg // LANE
    p = planes.shape[-2]
    call = _rows_sort_call(log_seg, p, n_w, n_seg, not per_window, interpret)
    key_in = key.reshape(n_w, n_seg, rows, LANE)
    if per_window:
        planes_in = planes.reshape(n_w, p, n_seg, rows, LANE)
        planes_in = jnp.swapaxes(planes_in, 1, 2)  # (W, S, P, rows, LANE)
    else:
        planes_in = planes.reshape(p, n_seg, rows, LANE)
        planes_in = jnp.swapaxes(planes_in, 0, 1)  # (S, P, rows, LANE)
    out_key, out_planes = call(key_in, planes_in)
    out_key = out_key.reshape(n_w, n)
    # (W, S, P, rows, LANE) -> (W, P, N): another middle-axis swap
    out_planes = jnp.swapaxes(out_planes, 1, 2).reshape(n_w, p, n)
    return out_key, out_planes


def rows_sort_segments(n: int) -> int:
    return max(n // ROWS_SORT_SEG, 1)


def bitonic_sort(operands, interpret: bool | None = None):
    """Sort 1-D or 2-D (batched) u32 operands by the first operand.

    operands: tuple of equal-shape u32 arrays, shape (n,) or (batch, n)
    with n a power of two in [2^MIN_LOG_N, 2^MAX_LOG_N]. Returns the
    operands reordered so operand 0 is ascending. NOT stable for equal
    keys (callers pack tiebreakers into the key)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    first = operands[0]
    squeeze = first.ndim == 1
    ops = [o[None] if squeeze else o for o in operands]
    batch, n = ops[0].shape
    log_n = n.bit_length() - 1
    rows = n // LANE
    call = _sort_call(log_n, len(ops), batch, interpret)
    out = call(*(o.reshape(batch, rows, LANE) for o in ops))
    out = [o.reshape(batch, n) for o in out]
    if squeeze:
        out = [o[0] for o in out]
    return tuple(out)
