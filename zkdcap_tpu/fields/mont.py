"""Batched Montgomery field arithmetic on TPU (JAX, uint32 lanes).

TPU-native equivalent of the reference's `halo2curves` field backends
(SURVEY.md §2.2 D-CURVE). Design (SURVEY.md §7.1): a field element is a
little-endian vector of 16 x 16-bit limbs held in uint32 lanes, batched over
arbitrary leading axes. All hot ops are branchless and shape-static so they
compose under jit / scan / shard_map.

Why radix 2^16 with uint32 accumulators: a 16x16-bit product is < 2^32 and
the CIOS accumulation bound (2^16-1)^2 + 2*(2^16-1) = 2^32 - 1 fits a uint32
exactly, so Montgomery multiplication (CIOS) runs entirely in native 32-bit
VPU lanes — TPUs have no 64-bit integer datapath (SURVEY.md §7.4 item 1).

Layout convention: packed form is `uint32[..., 16]`, limb-minor (the limb
axis last, contiguous in lanes). Internally ops unpack to a Python list of
16 `uint32[...]` arrays so XLA sees pure elementwise chains it can fuse.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .params import LIMB_BITS, LIMB_MASK, NUM_LIMBS, FieldParams, int_to_limbs

L = NUM_LIMBS
W = LIMB_BITS
# np (not jnp) scalar: a module-level jnp constant would initialise the XLA
# backend at import time, breaking jax.distributed.initialize (mesh.py)
MASK = np.uint32(LIMB_MASK)


# --- packing ---------------------------------------------------------------

def unpack(x: jax.Array) -> list[jax.Array]:
    """uint32[..., L] -> list of L uint32[...] limb arrays."""
    return [x[..., i] for i in range(L)]


def pack(limbs: Sequence[jax.Array]) -> jax.Array:
    """list of L uint32[...] -> uint32[..., L]."""
    return jnp.stack(list(limbs), axis=-1)


def const_limbs(value: int, params: FieldParams | None = None) -> np.ndarray:
    """Host-side packed constant (standard form unless caller converts)."""
    return int_to_limbs(value)


# --- per-field constant tables (host, cached) ------------------------------

@functools.cache
def _np_p(params: FieldParams) -> np.ndarray:
    return params.p_limbs.astype(np.uint32)


@functools.cache
def _np_r2(params: FieldParams) -> np.ndarray:
    return int_to_limbs(params.r2).astype(np.uint32)


@functools.cache
def _np_one_mont(params: FieldParams) -> np.ndarray:
    return int_to_limbs(params.r_mod_p).astype(np.uint32)


# --- carry / borrow chains -------------------------------------------------

def _carry_sweep(s: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Canonicalise packed limbs (each < 2^32) -> 16-bit limbs + carry_out.

    lax.scan over the limb axis keeps the traced program at ~4 ops
    regardless of limb count (trace size matters: see mont_mul docstring).
    """
    s_l = jnp.moveaxis(s, -1, 0)

    def body(c, s_i):
        v = s_i + c
        return v >> W, v & MASK

    c, out = jax.lax.scan(body, jnp.zeros_like(s[..., 0]), s_l)
    return jnp.moveaxis(out, 0, -1), c


def _carry_add(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(a + b) packed limbwise with carry propagation -> (packed, carry_out)."""
    return _carry_sweep(a + b)


def _borrow_sub(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(a - b) packed limbwise -> (packed, borrow_out in {0,1})."""
    a_l = jnp.moveaxis(a, -1, 0)
    b_l = jnp.moveaxis(b, -1, 0)

    def body(bw, ab):
        ai, bi = ab
        d = ai - bi - bw
        return (d >> W) & jnp.uint32(1), d & MASK

    bw, out = jax.lax.scan(body, jnp.zeros_like(a[..., 0]), (a_l, b_l))
    return jnp.moveaxis(out, 0, -1), bw


def _cond_sub_p(t: jax.Array, overflow: jax.Array, p: jax.Array) -> jax.Array:
    """Reduce packed t (< 2p, plus an overflow bit) into [0, p)."""
    diff, bw = _borrow_sub(t, jnp.broadcast_to(p, t.shape))
    need = jnp.logical_or(overflow > 0, bw == 0)
    return jnp.where(need[..., None], diff, t)


# --- public batched ops ----------------------------------------------------

@partial(jax.jit, static_argnums=0)
def add(params: FieldParams, a: jax.Array, b: jax.Array) -> jax.Array:
    """(a + b) mod p, packed Montgomery or standard form (form-agnostic)."""
    p = jnp.asarray(_np_p(params))
    s, c = _carry_add(a, b)
    return _cond_sub_p(s, c, p)


@partial(jax.jit, static_argnums=0)
def sub(params: FieldParams, a: jax.Array, b: jax.Array) -> jax.Array:
    """(a - b) mod p."""
    p = jnp.asarray(_np_p(params))
    d, bw = _borrow_sub(a, b)
    dp, _ = _carry_add(d, jnp.broadcast_to(p, d.shape))
    return jnp.where((bw > 0)[..., None], dp, d)


@partial(jax.jit, static_argnums=0)
def neg(params: FieldParams, a: jax.Array) -> jax.Array:
    """(-a) mod p (maps 0 -> 0)."""
    zero = jnp.zeros_like(a)
    is_zero = jnp.all(a == 0, axis=-1)
    p_arr = jnp.asarray(_np_p(params))
    p_b = jnp.broadcast_to(p_arr, a.shape)
    d = sub(params, p_b, a)
    return jnp.where(is_zero[..., None], zero, d)


@partial(jax.jit, static_argnums=0)
def mont_mul(params: FieldParams, a: jax.Array, b: jax.Array) -> jax.Array:
    """Montgomery product a*b*R^-1 mod p. Lazy-carry CIOS, radix 2^16.

    Replaces the scalar Montgomery mul inside halo2curves with a batched
    VPU-lane version. Carries are left unpropagated across the 16 CIOS
    rounds (limbs stay < 2^22 < 2^32, and the REDC multiplier m only needs
    the state mod 2^16, which unpropagated limbs still give exactly); a
    single carry sweep at the end canonicalises. The round loop is a
    lax.scan so the traced program stays tiny under jit.
    """
    n = jnp.asarray(_np_p(params))  # (L,)
    n0inv = jnp.uint32(params.n0inv)
    a_l = jnp.moveaxis(a, -1, 0)  # (L, ...) scan over multiplier limbs

    t0 = jnp.zeros(b.shape, jnp.uint32)
    zcol = jnp.zeros_like(t0[..., :1])

    def round_(t, a_i):
        p = a_i[..., None] * b  # (..., L) full 16x16 products in uint32
        plo = p & MASK
        phi = p >> W
        u0 = t[..., 0] + plo[..., 0]
        m = (u0 * n0inv) & MASK  # wraparound mult is exact mod 2^16
        q = m[..., None] * n
        qlo = q & MASK
        qhi = q >> W
        c0 = (u0 + qlo[..., 0]) >> W  # low limb is ≡ 0 mod 2^16 by REDC
        lo_sum = plo + qlo
        # After dividing by 2^16: t'[j] = t[j+1] + lo_sum[j+1] + (phi+qhi)[j]
        t_new = (
            jnp.concatenate([t[..., 1:] + lo_sum[..., 1:], zcol], -1)
            + phi
            + qhi
        )
        t_new = t_new.at[..., 0].add(c0)
        return t_new, None

    t, _ = jax.lax.scan(round_, t0, a_l)

    # Carry sweep: limbs < 2^22 -> canonical 16-bit limbs + overflow bit.
    out, c = _carry_sweep(t)
    return _cond_sub_p(out, c, n)


def mont_sqr(params: FieldParams, a: jax.Array) -> jax.Array:
    return mont_mul(params, a, a)


def to_mont(params: FieldParams, a: jax.Array) -> jax.Array:
    r2 = jnp.broadcast_to(jnp.asarray(_np_r2(params)), a.shape)
    return mont_mul(params, a, r2)


def from_mont(params: FieldParams, a: jax.Array) -> jax.Array:
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return mont_mul(params, a, one)


def one_mont(params: FieldParams, shape=()) -> jax.Array:
    return jnp.broadcast_to(jnp.asarray(_np_one_mont(params)), (*shape, L))


def zero(shape=()) -> jax.Array:
    return jnp.zeros((*shape, L), dtype=jnp.uint32)


@partial(jax.jit, static_argnums=(0, 2))
def mont_pow(params: FieldParams, a: jax.Array, e: int) -> jax.Array:
    """a^e in Montgomery form, fixed public exponent, via lax.scan over bits.

    Used for batched inversion (e = p-2) and square roots; the scan keeps the
    traced program small (2 mont_muls) regardless of exponent size.
    """
    nbits = max(e.bit_length(), 1)
    bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)], dtype=jnp.uint32)
    acc0 = one_mont(params, a.shape[:-1])

    # left-to-right: process bits from MSB
    def step(acc, bit):
        acc = mont_sqr(params, acc)
        with_mul = mont_mul(params, acc, a)
        acc = jnp.where(bit > 0, with_mul, acc)
        return acc, None

    acc, _ = jax.lax.scan(step, acc0, bits[::-1])
    return acc


def mont_inv(params: FieldParams, a: jax.Array) -> jax.Array:
    """Batched inversion via Fermat (a^(p-2)); maps 0 -> 0."""
    return mont_pow(params, a, params.p - 2)


@partial(jax.jit, static_argnums=0)
def batch_inv(params: FieldParams, x: jax.Array) -> jax.Array:
    """Montgomery batch-inversion trick over the leading axis of (N, L).

    ~3 multiplications per element (two scans + two pointwise muls) plus a
    single Fermat inversion of the total product — ~100x cheaper than
    elementwise Fermat for the prover's grand-product denominators.
    ALL elements must be nonzero."""
    mul = lambda a, b: mont_mul(params, a, b)
    prefix = jax.lax.associative_scan(mul, x, axis=0)  # inclusive prods
    suffix = jax.lax.associative_scan(mul, x, axis=0, reverse=True)
    total_inv = mont_inv(params, prefix[-1])  # one Fermat on one element
    one = one_mont(params, (1,))
    pre_shift = jnp.concatenate([one, prefix[:-1]], axis=0)  # prod before i
    suf_shift = jnp.concatenate([suffix[1:], one], axis=0)  # prod after i
    ti = jnp.broadcast_to(total_inv, x.shape)
    return mul(mul(pre_shift, suf_shift), ti)


def is_zero(a: jax.Array) -> jax.Array:
    return jnp.all(a == 0, axis=-1)


def eq(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.all(a == b, axis=-1)


def select(cond: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """cond ? a : b with cond shaped like the batch (no limb axis)."""
    return jnp.where(cond[..., None], a, b)


# --- host <-> device conversion -------------------------------------------

def encode_ints(params: FieldParams, values, to_montgomery: bool = True) -> jax.Array:
    """Host list/array of python ints -> packed device array (Montgomery).

    Bulk path: int.to_bytes + np.frombuffer (C speed) instead of per-limb
    python loops — keygen encodes tens of millions of limbs.
    """
    p = params.p
    buf = b"".join((int(v) % p).to_bytes(32, "little") for v in values)
    arr = np.frombuffer(buf, dtype=np.uint16).reshape(-1, L).astype(np.uint32)
    x = jnp.asarray(arr)
    return to_mont(params, x) if to_montgomery else x


def decode_ints(params: FieldParams, x: jax.Array, from_montgomery: bool = True) -> list[int]:
    """Packed device array (..., L) -> flat list of python ints (bulk path)."""
    if from_montgomery:
        x = from_mont(params, x)
    arr = np.asarray(jax.device_get(x)).astype(np.uint16)
    flat = arr.reshape(-1, L).tobytes()
    return [
        int.from_bytes(flat[32 * i : 32 * (i + 1)], "little")
        for i in range(len(flat) // 32)
    ]
