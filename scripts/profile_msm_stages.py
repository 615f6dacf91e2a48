#!/usr/bin/env python
"""Stage-level profile of the Pippenger MSM at 2^20 on the live backend.

Times jitted sub-programs that mirror msm_device's stages so the budget in
BENCH.md can be re-derived on demand. Outputs are forced by pulling ONE
element (axon's block_until_ready does not force; device_get of the full
arrays would measure the tunnel, not the kernel).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import _dev_scalars, _enable_compile_cache  # noqa: E402

_enable_compile_cache()
from zkdcap_tpu.curves import BN254_G1  # noqa: E402
from zkdcap_tpu.curves.device_g1 import G1_SPEC, encode_points  # noqa: E402
from zkdcap_tpu.fields import mont  # noqa: E402
from zkdcap_tpu.fields.params import NUM_LIMBS  # noqa: E402
from zkdcap_tpu.msm import pippenger as pp  # noqa: E402

L = NUM_LIMBS
LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
N = 1 << LOG_N
G = min(16384, N)
M = N // G
f = G1_SPEC.field
WP = pp._window_parallel(pp.NUM_WINDOWS, G)
NGROUPS = pp.NUM_WINDOWS // WP
K = min(N, G + pp.NUM_BUCKETS)


def force(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    force(out)
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        force(out)
        ts.append(time.time() - t0)
    print(f"{name:38s} {min(ts)*1e3:9.1f} ms", flush=True)
    return out


def main():
    import random

    rng = random.Random(1)
    scal_std = _dev_scalars(N, L)
    base_pts = [BN254_G1.mul(rng.randrange(1, 1 << 60), BN254_G1.g) for _ in range(64)]
    base = np.asarray(encode_points(G1_SPEC, base_pts))
    pts = jnp.asarray(np.tile(base, (N // base.shape[0], 1, 1)))
    rows = pts.reshape(N, 2 * L)
    print(
        f"backend={jax.default_backend()} N=2^{LOG_N} G={G} M={M} "
        f"c={pp.WINDOW_BITS} W={pp.NUM_WINDOWS} WP={WP} K={K}",
        flush=True,
    )

    full = jax.jit(lambda p, s: pp.msm_device(G1_SPEC, p, s, G))
    timeit("FULL msm_device", full, pts, scal_std)

    digits_fn = jax.jit(pp._signed_digits)
    timeit("signed digits", digits_fn, scal_std)
    digits = digits_fn(scal_std)

    idxN = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def sort_all(dW):
        def one(d_w):
            key = jnp.abs(d_w).astype(jnp.uint32)
            payload = jnp.where(d_w < 0, idxN | (1 << pp._IDX_BITS), idxN)
            skey, sp = jax.lax.sort((key, payload), num_keys=1)
            return skey, sp

        return jax.lax.map(one, dW)

    (skeys, sps) = timeit(f"sort x{pp.NUM_WINDOWS} (two-operand)", sort_all, digits)

    from zkdcap_tpu.curves.ec_kernels import ec_madd_scan_full, pack_affine_rows

    prows = pack_affine_rows(pts)  # (N, L) u16-packed rows

    @jax.jit
    def gather_all(sps):
        def one(sp):
            order = sp & ((1 << pp._IDX_BITS) - 1)
            return jnp.take(prows, order, axis=0)

        return jax.lax.map(one, sps)

    timeit(f"gather x{pp.NUM_WINDOWS} (u16-packed L rows)", gather_all, sps)

    # EC lane scan, one group's worth (multiply by NGROUPS for total)
    B = WP * G
    Pm = jnp.zeros((M, L, B), jnp.uint32)
    masks = jnp.ones((M, 3, B), jnp.uint32)

    @jax.jit
    def scan_only(Pm, masks):
        return ec_madd_scan_full(G1_SPEC, Pm, masks)

    timeit(f"EC whole-scan kernel (1 of {NGROUPS})", scan_only, Pm, masks)

    # layout transposes (to_mlb both directions), 1 group
    Xp = jnp.zeros((WP, N, L), jnp.uint32)

    @jax.jit
    def transposes(A):
        m = A.reshape(WP, G, M, L).transpose(2, 3, 0, 1).reshape(M, L, B)
        back = m.reshape(M, L, WP, G).transpose(2, 3, 0, 1).reshape(WP, N, L)
        return back

    timeit(f"layout transpose x2 (1 of {NGROUPS})", transposes, Xp)

    # compaction: cumsum + index scatter + K-row gathers, 1 group
    dsort = skeys[:WP].astype(jnp.int32)
    sX = jnp.zeros((WP, N, L), jnp.uint32)
    idxK = jnp.arange(K, dtype=jnp.int32)

    @jax.jit
    def compact_all(dW, sX):
        def one(d, sx):
            is_lane_end = (idxN % M) == (M - 1)
            d_next = jnp.concatenate([d[1:], jnp.full((1,), -1, jnp.int32)])
            is_end = jnp.logical_or(is_lane_end, d != d_next)
            pos = jnp.cumsum(is_end.astype(jnp.int32)) - 1
            slot = jnp.where(is_end, pos, K)
            cidx = jnp.zeros((K + 1,), jnp.int32).at[slot].set(idxN)[:K]
            return jnp.take(d, cidx), jnp.take(sx, cidx, axis=0)

        return jax.vmap(one)(dW, sX)

    timeit(f"compact cumsum+scatter (1 of {NGROUPS})", compact_all, dsort, sX)

    # Hillis-Steele over (WP, K) — count levels
    n_levels = max((K - 1).bit_length(), 1)
    print(f"(HS levels per group: {n_levels})", flush=True)


if __name__ == "__main__":
    main()
