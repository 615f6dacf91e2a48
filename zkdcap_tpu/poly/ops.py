"""Device polynomial utilities used by the KZG/SHPLONK layer.

All polys are packed Montgomery coefficient arrays uint32[n, L], low degree
first. Scalars cross the host/device boundary as python ints (host is where
transcript challenges live — SURVEY.md §3.1 "the device boundary cuts
between transcript (host) and poly/MSM work (device)").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..fields import mont
from ..fields.params import NUM_LIMBS, FieldParams
from ..ntt.ntt import _doubling_table


def power_table_for(params: FieldParams, x: int, n: int) -> jax.Array:
    """[x^0 .. x^(n-1)] Montgomery on device (built with log n muls)."""
    log_n = max((n - 1).bit_length(), 1)
    return _doubling_table(params, x, log_n)[:n]


def power_table_row(params: FieldParams, x_row: jax.Array, n: int) -> jax.Array:
    """[x^0 .. x^(n-1)] Montgomery from a TRACED (L,) Montgomery base —
    same doubling construction as power_table_for, but usable inside a jit
    where the base is a per-proof challenge value rather than a host int."""
    from ..fields import mont

    log_n = max((n - 1).bit_length(), 1)
    tab = mont.one_mont(params, (1,))
    cur = x_row
    for _ in range(log_n):
        shift = jnp.broadcast_to(cur[None, :], tab.shape)
        tab = jnp.concatenate([tab, mont.mont_mul(params, tab, shift)], axis=0)
        cur = mont.mont_mul(params, cur[None], cur[None])[0]
    return tab[:n]


@partial(jax.jit, static_argnums=0)
def batched_sum(params: FieldParams, a: jax.Array) -> jax.Array:
    """Field-sum over the leading axis: (n, ..., L) -> (..., L), log-depth."""
    n = a.shape[0]
    while n > 1:
        half = n // 2
        lo = a[:half]
        hi = a[half : 2 * half]
        rest = a[2 * half :]
        a = mont.add(params, lo, hi)
        if rest.shape[0]:
            a = jnp.concatenate([a, rest], axis=0)
        n = a.shape[0]
    return a[0]


def poly_eval(params: FieldParams, coeffs: jax.Array, x: int) -> int:
    """Evaluate a device coefficient poly at host scalar x -> host int."""
    n = coeffs.shape[0]
    powers = power_table_for(params, x, n)
    terms = mont.mont_mul(params, coeffs, powers)
    return mont.decode_ints(params, batched_sum(params, terms))[0]


def poly_eval_many(params: FieldParams, coeffs_list, x: int) -> list[int]:
    """Evaluate many polys at x (zero-padded to equal length; shared table)."""
    if not coeffs_list:
        return []
    coeffs_list = list(coeffs_list)
    nmax = max(c.shape[0] for c in coeffs_list)
    coeffs_list = [
        c
        if c.shape[0] == nmax
        else jnp.concatenate([c, jnp.zeros((nmax - c.shape[0], NUM_LIMBS), jnp.uint32)])
        for c in coeffs_list
    ]
    stacked = jnp.stack(coeffs_list, axis=1)  # (n, m, L)
    n = stacked.shape[0]
    powers = power_table_for(params, x, n)[:, None, :]
    terms = mont.mont_mul(params, stacked, jnp.broadcast_to(powers, stacked.shape))
    return mont.decode_ints(params, batched_sum(params, terms))


def divide_by_linear(params: FieldParams, coeffs: jax.Array, u: int) -> jax.Array:
    """Exact division q(X) = (f(X) - f(u)) / (X - u), u != 0.

    Uses the closed form q_j = u^(-j-1) * sum_{i>j} a_i u^i: a power-table
    multiply, a log-depth suffix sum (associative scan over field adds), and
    another power-table multiply — no sequential Horner recurrence, so it
    parallelises over the coefficient axis (SURVEY.md §7.1: shape-static,
    scan-friendly array programs).
    """
    assert u % params.p != 0
    n = coeffs.shape[0]
    pow_u = power_table_for(params, u, n + 1)
    c = mont.mont_mul(params, coeffs, pow_u[:n])  # a_i u^i
    # suffix sums S_j = sum_{i >= j} a_i u^i
    s = jax.lax.associative_scan(
        lambda x, y: mont.add(params, x, y), c, reverse=True, axis=0
    )
    # q_j = S_{j+1} * u^{-(j+1)}
    s_next = jnp.concatenate([s[1:], jnp.zeros((1, NUM_LIMBS), jnp.uint32)], axis=0)
    uinv = pow(u, -1, params.p)
    pow_uinv = power_table_for(params, uinv, n + 1)
    return mont.mont_mul(params, s_next, pow_uinv[1 : n + 1])


def divide_by_linear_row(
    params: FieldParams, coeffs: jax.Array, u_row: jax.Array, uinv_row: jax.Array
) -> jax.Array:
    """divide_by_linear with a TRACED point: u and u^-1 enter as (L,)
    Montgomery rows so the division can live inside a per-pk jitted program
    instead of baking the per-proof challenge into a fresh XLA compile."""
    n = coeffs.shape[0]
    pow_u = power_table_row(params, u_row, n + 1)
    c = mont.mont_mul(params, coeffs, pow_u[:n])
    s = jax.lax.associative_scan(
        lambda x, y: mont.add(params, x, y), c, reverse=True, axis=0
    )
    s_next = jnp.concatenate([s[1:], jnp.zeros((1, NUM_LIMBS), jnp.uint32)], axis=0)
    pow_uinv = power_table_row(params, uinv_row, n + 1)
    return mont.mont_mul(params, s_next, pow_uinv[1 : n + 1])


def poly_sub_scalar(params: FieldParams, coeffs: jax.Array, c: int) -> jax.Array:
    """f(X) - c."""
    c_arr = mont.encode_ints(params, [c])[0]
    return coeffs.at[0].set(mont.sub(params, coeffs[0], c_arr))


def poly_add(params: FieldParams, a: jax.Array, b: jax.Array) -> jax.Array:
    n = max(a.shape[0], b.shape[0])
    if a.shape[0] < n:
        a = jnp.concatenate([a, jnp.zeros((n - a.shape[0], NUM_LIMBS), jnp.uint32)])
    if b.shape[0] < n:
        b = jnp.concatenate([b, jnp.zeros((n - b.shape[0], NUM_LIMBS), jnp.uint32)])
    return mont.add(params, a, b)


def poly_sub(params: FieldParams, a: jax.Array, b: jax.Array) -> jax.Array:
    n = max(a.shape[0], b.shape[0])
    if a.shape[0] < n:
        a = jnp.concatenate([a, jnp.zeros((n - a.shape[0], NUM_LIMBS), jnp.uint32)])
    if b.shape[0] < n:
        b = jnp.concatenate([b, jnp.zeros((n - b.shape[0], NUM_LIMBS), jnp.uint32)])
    return mont.sub(params, a, b)


def poly_scale(params: FieldParams, a: jax.Array, c: int) -> jax.Array:
    c_arr = jnp.broadcast_to(mont.encode_ints(params, [c]), a.shape)
    return mont.mont_mul(params, a, c_arr)
