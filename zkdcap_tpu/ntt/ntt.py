"""Radix-2 NTT over BN254 Fr on TPU.

TPU-native replacement for halo2's EvaluationDomain FFT (SURVEY.md §2.3:
"rayon parallel NTT ... radix-2 butterflies, bit-reversal" inside
halo2_proofs; invoked by create_proof for quotient/extended-domain work,
`circuits/src/sgx_dcap_verifier.rs:814-822`).

Design: one jitted program per size. The stage loop is a `lax.fori_loop`
whose body does three gathers (lo element, hi element, twiddle) plus one
batched Montgomery multiply — shapes stay (n, L) for every stage so the
traced program is tiny. Twiddle tables are built on device by repeated
doubling (log n batched multiplies) and cached per (field, size, direction).

The multi-chip version (all-to-all stage exchange over a mesh) lives in
`zkdcap_tpu/parallel/sharded_ntt.py`.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import mont
from ..fields.params import NUM_LIMBS, FieldParams, int_to_limbs


def _cache_concrete(fn):
    """functools.cache that refuses to memoise tracers. These helpers build
    device tables by calling jitted sub-programs; when such a helper is
    FIRST invoked inside an outer trace (e.g. the prover's jitted quotient
    program), the result is a tracer of that trace — caching it leaks it
    into later calls (UnexpectedTracerError). Inside a trace the value is
    recomputed (free: it folds into the surrounding program); concrete
    results are cached as before."""
    cache = {}

    @functools.wraps(fn)
    def wrapped(*args):
        hit = cache.get(args)
        if hit is not None:
            return hit
        out = fn(*args)
        if not isinstance(
            out, jax.core.Tracer
        ) and not any(isinstance(o, jax.core.Tracer) for o in jax.tree_util.tree_leaves(out)):
            cache[args] = out
        return out

    return wrapped


@functools.cache
def bit_reverse_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@partial(jax.jit, static_argnums=(0, 1))
def _doubling_table_impl(params: FieldParams, shifts_mont: tuple[tuple[int, ...], ...]) -> jax.Array:
    """[1, w, w^2, ...] of length 2^len(shifts) built by repeated doubling
    T_{k+1} = [T_k, T_k * w^(2^k)] inside ONE jitted program (one compile).
    shifts_mont[k] = limbs of w^(2^k) in Montgomery form (static constant)."""
    tab = mont.one_mont(params, (1,))
    for limbs in shifts_mont:
        shift = jnp.asarray(np.asarray(limbs, dtype=np.uint32))
        shift_b = jnp.broadcast_to(shift, tab.shape)
        tab = jnp.concatenate([tab, mont.mont_mul(params, tab, shift_b)], axis=0)
    return tab


def _doubling_table(params: FieldParams, base: int, log_len: int) -> jax.Array:
    from ..fields.params import R

    p = params.p
    shifts = []
    step = base % p
    for _ in range(log_len):
        shifts.append(tuple(int(v) for v in int_to_limbs(step * R % p)))
        step = step * step % p
    return _doubling_table_impl(params, tuple(shifts))


@_cache_concrete
def twiddle_table(params: FieldParams, log_n: int, inverse: bool) -> jax.Array:
    """Device table [w^0, w^1, ..., w^(n/2 - 1)] in Montgomery form."""
    w = params.nth_root_of_unity(log_n)
    if inverse:
        w = pow(w, -1, params.p)
    return _doubling_table(params, w, max(log_n - 1, 0))


@partial(jax.jit, static_argnums=(0, 3, 4))
def _ntt_impl(params: FieldParams, a: jax.Array, tw: jax.Array, log_n: int,
              inverse: bool = False) -> jax.Array:
    """Iterative radix-2 DIT with reshape/stack butterflies.

    One bit-reversal gather up front, then every stage is static-strided
    slicing — no data-dependent gathers, which on TPU are ~100x slower
    than the contiguous loads XLA emits for reshapes. Large sizes run the
    fused Pallas butterfly kernel in limb-major layout (one VMEM pass per
    stage instead of the scan's per-round materialisation)."""
    n = 1 << log_n
    L = a.shape[-1]
    perm = jnp.asarray(bit_reverse_perm(log_n))
    a = jnp.take(a, perm, axis=0)

    from ..fields.pallas_mont import BLOCK, butterfly

    if (n // 2) % BLOCK == 0 and jax.default_backend() == "tpu":
        from ..fields.pallas_mont import fused_low_stages

        at = a.T  # (L, n) limb-major for the kernel
        at, s_start = fused_low_stages(params, at, log_n, inverse)
        for s in range(s_start, log_n):
            m = 1 << s
            stride = n >> (s + 1)
            w_stage = tw[::stride][:m]  # (m, L)
            A = at.reshape(L, n // (2 * m), 2, m)
            lo = A[:, :, 0, :].reshape(L, n // 2)
            hi = A[:, :, 1, :].reshape(L, n // 2)
            w_t = jnp.tile(w_stage.T, (1, n // (2 * m)))  # (L, n//2)
            plus, minus = butterfly(params, lo, hi, w_t)
            at = jnp.stack(
                [plus.reshape(L, n // (2 * m), m), minus.reshape(L, n // (2 * m), m)],
                axis=2,
            ).reshape(L, n)
        return at.T

    for s in range(log_n):
        m = 1 << s
        stride = n >> (s + 1)
        w_stage = tw[::stride][:m]  # (m, L)
        A = a.reshape(n // (2 * m), 2, m, L)
        lo = A[:, 0]
        hi = A[:, 1]
        t = mont.mont_mul(params, hi, jnp.broadcast_to(w_stage[None], hi.shape))
        a = jnp.stack(
            [mont.add(params, lo, t), mont.sub(params, lo, t)], axis=1
        ).reshape(n, L)
    return a


# --- two-pass four-step NTT (whole-transform VMEM residency) ---------------
#
# n = N1 * N2 (both <= 2^11 = the fused kernel's chunk): pass A runs N2
# independent size-N1 sub-NTTs (packed into 2048-lane chunks, all stages in
# one VMEM residency), the inter-pass twiddles w^(j*k1) are one fused
# Pallas multiply, pass B runs N1 size-N2 sub-NTTs. Strided work happens
# only in the 3 dense transposes — the per-stage strided reshape/stack
# interleaves of the flat radix-2 path (11 HBM round trips at 2^22) go away.

_FOUR_STEP_MIN_LOG = 12


def _four_step_split(log_n: int) -> tuple[int, int]:
    log_n1 = log_n // 2
    assert log_n - log_n1 <= 11, "four-step needs n <= 2^22"
    return log_n1, log_n - log_n1


@_cache_concrete
def _four_step_twiddles(params: FieldParams, log_n: int, inverse: bool) -> jax.Array:
    """(L, n) device table: tw[:, j*N1 + k1] = w^(+-j*k1) [* n^-1 if inverse]."""
    from ..fields import mont

    n = 1 << log_n
    log_n1, log_n2 = _four_step_split(log_n)
    N1, N2 = 1 << log_n1, 1 << log_n2
    w = params.nth_root_of_unity(log_n)
    if inverse:
        w = pow(w, -1, params.p)
    ptab = power_table(params, w, n)  # (n, L) Montgomery
    j = np.arange(N2, dtype=np.int64)[:, None]
    k1 = np.arange(N1, dtype=np.int64)[None, :]
    idx = ((j * k1) % n).astype(np.int32).reshape(-1)
    tw = jnp.take(ptab, jnp.asarray(idx), axis=0)  # (N2*N1, L)
    if inverse:
        # fold the 1/n scale into the (single) twiddle pass
        ninv = _n_inv_mont(params, log_n)
        tw = mont.mont_mul(params, tw, jnp.broadcast_to(ninv, tw.shape))
    return tw.T.copy()  # (L, n) limb-major


def _use_r12() -> bool:
    """Redundant 12-bit-limb kernel interiors (fields/r12.py): ~1.3x fewer
    u32 ops per stage; bit-identical outputs. ZKDCAP_NTT_R12=0 reverts to
    the 16x16 kernels. TPU-only: in interpret mode the 22-limb unrolled
    body is impractically slow to even compile (the CPU suite covers the
    r12 arithmetic via tests/test_r12.py and the 16x16 kernels end to
    end; the r12 kernels are validated on-chip, scripts/ + golden
    proofs)."""
    import os

    return (jax.default_backend() == "tpu"
            and os.environ.get("ZKDCAP_NTT_R12", "1") != "0")


@partial(jax.jit, static_argnums=(0, 5, 6, 7, 8))
def _four_step_run(params: FieldParams, at, tw, passA, passB, log_n: int,
                   r12: bool = False, cgA: bool = False, cgB: bool = False):
    """at: (L, n) limb-major natural order -> (L, n) transformed.

    Both bit-reversals happen IN VMEM inside the fused kernels (5 lane-roll
    pair swaps each — no 2x full-array HBM gathers), and the inter-pass
    twiddle multiply rides pass A's epilogue (no separate kernel launch).
    cgA/cgB select the constant-geometry kernel (half-width twiddle muls)
    for the respective pass; outputs are bit-identical either way."""
    from ..fields.pallas_mont import _fused_pass_call

    n = 1 << log_n
    log_n1, log_n2 = _four_step_split(log_n)
    N1, N2 = 1 << log_n1, 1 << log_n2
    interpret = jax.default_backend() != "tpu"
    L = NUM_LIMBS

    # pass A: size-N1 NTT over i for each column j (+ inter-pass twiddles,
    # which include the 1/n scale when inverse)
    A = at.reshape(L, N1, N2)
    At = jnp.swapaxes(A, 1, 2)  # (L, N2, N1): row j holds i contiguous
    flat = At.reshape(L, n)
    flat = _fused_pass_call(params, log_n1, n, interpret,
                            bitrev_in=True, post_mul=True,
                            r12=r12, cg=cgA)(flat, *passA, tw)
    # pass B: size-N2 NTT over j for each row k1
    B = jnp.swapaxes(flat.reshape(L, N2, N1), 1, 2)  # (L, N1, N2)
    flat = _fused_pass_call(params, log_n2, n, interpret,
                            bitrev_in=True, r12=r12,
                            cg=cgB)(B.reshape(L, n), *passB)
    # natural order: out[k1 + N1*k2] = D[k1, k2]
    D = flat.reshape(L, N1, N2)
    return jnp.swapaxes(D, 1, 2).reshape(L, n)


def _four_step_ok(params: FieldParams, log_n: int) -> bool:
    from ..fields.pallas_mont import FUSED_CHUNK

    if log_n < _FOUR_STEP_MIN_LOG or log_n > 22:
        return False
    log_n1, log_n2 = _four_step_split(log_n)
    return (1 << log_n1) <= FUSED_CHUNK and (1 << log_n2) <= FUSED_CHUNK


@_cache_concrete
def _four_step_twiddles12(params: FieldParams, log_n: int, inverse: bool) -> jax.Array:
    """(22, n) r12-digit inter-pass twiddle table, pre-scaled by 2^8: the
    16-limb Montgomery table times r12.scale_mont_factor, digit-repacked
    on device (pure bit ops)."""
    from ..fields import mont
    from ..fields.r12 import scale_mont_factor, unpack16

    tw16 = _four_step_twiddles(params, log_n, inverse)  # (L, n)
    scale = mont.encode_ints(params, [scale_mont_factor(params)])  # (1, L)
    tw16s = mont.mont_mul(params, tw16.T, jnp.broadcast_to(scale, tw16.T.shape)).T
    return jnp.stack(unpack16([tw16s[j] for j in range(NUM_LIMBS)]))


def ntt_four_step(params: FieldParams, a: jax.Array, inverse: bool = False) -> jax.Array:
    """Four-step NTT of (n, L) natural-order input. For inverse, the 1/n
    scale is already folded in (full intt equivalence)."""
    from ..fields.pallas_mont import fused_pass_tables, fused_pass_tables12

    import os

    n = a.shape[0]
    log_n = n.bit_length() - 1
    log_n1, log_n2 = _four_step_split(log_n)
    r12 = _use_r12()
    # constant-geometry kernels need every span >= one lane tile inside
    # 4-stage groups: pass sizes >= 2^10 qualify (2^22/2^20 fully, 2^19's
    # B pass only)
    use_cg = r12 and os.environ.get("ZKDCAP_NTT_CG", "1") != "0"
    cgA = use_cg and log_n1 >= 10
    cgB = use_cg and log_n2 >= 10
    if r12:
        from ..fields.pallas_mont import fused_cg_tables12

        tw = _four_step_twiddles12(params, log_n, inverse)
        passA = ((fused_cg_tables12(params, log_n1, inverse),) if cgA
                 else fused_pass_tables12(params, log_n1, inverse))
        passB = ((fused_cg_tables12(params, log_n2, inverse),) if cgB
                 else fused_pass_tables12(params, log_n2, inverse))
    else:
        tw = _four_step_twiddles(params, log_n, inverse)
        passA = fused_pass_tables(params, log_n1, inverse)
        passB = fused_pass_tables(params, log_n2, inverse)
    out = _four_step_run(params, a.T, tw, passA, passB, log_n, r12, cgA, cgB)
    return out.T


def _use_four_step(log_n: int) -> bool:
    import os

    if os.environ.get("ZKDCAP_NO_FOUR_STEP"):
        return False
    return jax.default_backend() == "tpu" and log_n >= _FOUR_STEP_MIN_LOG and log_n <= 22


def ntt(params: FieldParams, a: jax.Array) -> jax.Array:
    """Forward NTT: coefficients (natural order) -> evaluations at w^i."""
    n = a.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "NTT size must be a power of two"
    if n == 1:
        return a
    if _use_four_step(log_n):
        return ntt_four_step(params, a, False)
    return _ntt_impl(params, a, twiddle_table(params, log_n, False), log_n, False)


@_cache_concrete
def _n_inv_mont(params: FieldParams, log_n: int) -> jax.Array:
    return mont.encode_ints(params, [pow(1 << log_n, -1, params.p)])


def _pad_batch(arrays: list[jax.Array], quantum: int = 4) -> list[jax.Array]:
    """Pad a poly batch to a multiple of `quantum` with zero polys so the
    compiled program shape is reused across rounds/batch sizes."""
    n, L_ = arrays[0].shape
    out = list(arrays)
    import jax.numpy as _jnp

    while len(out) % quantum:
        out.append(_jnp.zeros((n, L_), _jnp.uint32))
    return out


def ntt_many(params: FieldParams, arrays: list[jax.Array]) -> list[jax.Array]:
    """Batched forward NTT of equal-length polys (one fused device call)."""
    if not arrays:
        return []
    n = arrays[0].shape[0]
    log_n = n.bit_length() - 1
    padded = _pad_batch(arrays)
    batch = jnp.stack(padded)
    # lax.map (not vmap): the body may contain a pallas_call
    if _use_four_step(log_n):
        out = jax.lax.map(lambda x: ntt_four_step(params, x, False), batch)
    else:
        tw = twiddle_table(params, log_n, False)
        out = jax.lax.map(lambda x: _ntt_impl(params, x, tw, log_n, False), batch)
    return [out[i] for i in range(len(arrays))]


def intt_many(params: FieldParams, arrays: list[jax.Array]) -> list[jax.Array]:
    """Batched inverse NTT of equal-length polys."""
    if not arrays:
        return []
    n = arrays[0].shape[0]
    log_n = n.bit_length() - 1
    padded = _pad_batch(arrays)
    batch = jnp.stack(padded)
    if _use_four_step(log_n):
        out = jax.lax.map(lambda x: ntt_four_step(params, x, True), batch)
        return [out[i] for i in range(len(arrays))]
    tw = twiddle_table(params, log_n, True)
    ninv = _n_inv_mont(params, log_n)

    def one(x):
        y = _ntt_impl(params, x, tw, log_n, True)
        return mont.mont_mul(params, y, jnp.broadcast_to(ninv, y.shape))

    out = jax.lax.map(one, batch)
    return [out[i] for i in range(len(arrays))]


def intt(params: FieldParams, a: jax.Array) -> jax.Array:
    """Inverse NTT: evaluations -> coefficients (natural order)."""
    n = a.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if n == 1:
        return a
    if _use_four_step(log_n):
        return ntt_four_step(params, a, True)
    out = _ntt_impl(params, a, twiddle_table(params, log_n, True), log_n, True)
    ninv = jnp.broadcast_to(_n_inv_mont(params, log_n), out.shape)
    return mont.mont_mul(params, out, ninv)


@_cache_concrete
def power_table(params: FieldParams, base: int, n: int) -> jax.Array:
    """Device table [base^0 .. base^(n-1)] (Montgomery), doubling-built."""
    log_n = max((n - 1).bit_length(), 1)
    return _doubling_table(params, base, log_n)[:n]


class Domain:
    """Evaluation domain over a 2-adic field (halo2 EvaluationDomain analog).

    Handles the three polynomial bases the PLONK prover moves between:
    coefficient form, Lagrange form on H = <omega> (|H| = 2^k), and Lagrange
    form on the extended coset g*H' (|H'| = 2^(k + extended_k_delta)) used
    for quotient evaluation.
    """

    def __init__(self, params: FieldParams, k: int, extended_k: int | None = None):
        self.params = params
        self.k = k
        self.n = 1 << k
        self.extended_k = extended_k if extended_k is not None else k
        self.extended_n = 1 << self.extended_k
        p = params.p
        self.omega = params.nth_root_of_unity(k)
        self.omega_inv = pow(self.omega, -1, p)
        self.extended_omega = params.nth_root_of_unity(self.extended_k)
        # Coset generator: the field's multiplicative generator (zeta in halo2).
        self.g_coset = params.generator
        self.g_coset_inv = pow(self.g_coset, -1, p)

    def coeff_to_lagrange(self, a: jax.Array) -> jax.Array:
        return ntt(self.params, a)

    def lagrange_to_coeff(self, a: jax.Array) -> jax.Array:
        return intt(self.params, a)

    def coeff_to_extended(self, a: jax.Array) -> jax.Array:
        """Evaluate coeffs on the extended coset g*H'. Input len n, output len extended_n."""
        pad = self.extended_n - a.shape[0]
        if pad > 0:
            a = jnp.concatenate(
                [a, jnp.zeros((pad, NUM_LIMBS), jnp.uint32)], axis=0
            )
        # scale coefficient i by g^i, then plain NTT on the extended domain
        powers = power_table(self.params, self.g_coset, self.extended_n)
        a = mont.mont_mul(self.params, a, powers)
        return ntt(self.params, a)

    def extended_to_coeff(self, a: jax.Array) -> jax.Array:
        """Inverse of coeff_to_extended; returns extended_n coefficients."""
        a = intt(self.params, a)
        powers = power_table(self.params, self.g_coset_inv, self.extended_n)
        return mont.mont_mul(self.params, a, powers)
