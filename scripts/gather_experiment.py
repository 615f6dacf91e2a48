#!/usr/bin/env python
"""Measure XLA TPU row-gather cost vs row width/dtype at 2^20 rows.

Decides the MSM gather layout (scripts/profile_msm_stages.py shows the
packed-row gather is 52% of msm_device). Prints ms per single gather.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20


def force(out):
    np.asarray(jax.device_get(jnp.ravel(out)[:1]))


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    force(out)
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        force(out)
        ts.append(time.time() - t0)
    print(f"{name:44s} {min(ts)*1e3:9.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    print(f"backend={jax.default_backend()} N=2^20", flush=True)

    for cols, dt in [(32, jnp.uint32), (16, jnp.uint32), (8, jnp.uint32),
                     (64, jnp.uint32), (16, jnp.uint64), (8, jnp.uint64),
                     (4, jnp.uint64)]:
        rows = jnp.zeros((N, cols), dt)
        fn = jax.jit(lambda r, p: jnp.take(r, p, axis=0))
        timeit(f"take rows=(2^20,{cols}) {dt.__name__}", fn, rows, perm)

    # u64 bitcast round-trip of the real MSM layout: (N, 32)u32 -> (N,16)u64
    rows32 = jnp.zeros((N, 32), jnp.uint32)

    @jax.jit
    def take_u64_view(r, p):
        r64 = jax.lax.bitcast_convert_type(r.reshape(N, 16, 2), jnp.uint64)
        g = jnp.take(r64, p, axis=0)
        return jax.lax.bitcast_convert_type(g, jnp.uint32).reshape(N, 32)

    timeit("take (2^20,32)u32 via u64 bitcast view", take_u64_view, rows32, perm)

    # scatter-set comparison (permutation write instead of read)
    @jax.jit
    def scatter_set(r, p):
        return jnp.zeros_like(r).at[p].set(r, unique_indices=True,
                                           indices_are_sorted=False)

    timeit("scatter (2^20,32)u32 at[perm].set", scatter_set, rows32, perm)

    # 2^19 rows x 64 cols (same bytes, half the rows)
    rows_h = jnp.zeros((N // 2, 64), jnp.uint32)
    perm_h = jnp.asarray(rng.permutation(N // 2).astype(np.int32))
    fn = jax.jit(lambda r, p: jnp.take(r, p, axis=0))
    timeit("take rows=(2^19,64) u32 (same bytes)", fn, rows_h, perm_h)


if __name__ == "__main__":
    main()
