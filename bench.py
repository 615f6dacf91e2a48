#!/usr/bin/env python
"""Benchmark entry point (driver contract: prints ONE JSON line).

Headline metric: BN254 Pippenger MSM throughput at 2^20 points on one chip
(BASELINE.md: "BN254 MSM points/sec/chip (2^20 points)"). The reference
publishes no numbers (BASELINE.md), so vs_baseline is measured against the
self-baseline recorded in BASELINE.json's north star; until a reference
wall-clock exists we report vs_baseline=1.0 at the 1-chip measurement.

Extra phase timings (NTT 2^22, etc.) go to stderr so the stdout contract
stays a single JSON line.
"""

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_msm(log_n: int, iters: int = 3) -> float:
    import random

    import jax
    import jax.numpy as jnp

    from zkdcap_tpu.curves.device_g1 import G1_SPEC
    from zkdcap_tpu.fields import BN254_FR, mont
    from zkdcap_tpu.fields.params import NUM_LIMBS
    from zkdcap_tpu.msm import msm

    n = 1 << log_n
    rng = random.Random(1)
    key = jax.random.PRNGKey(0)
    # random-looking (but valid) scalars: random 16-bit limbs, top limb clamped
    scal = jax.random.randint(key, (n, NUM_LIMBS), 0, 1 << 16, dtype=jnp.int32).astype(jnp.uint32)
    scal = scal.at[:, NUM_LIMBS - 1].set(0)  # < 2^240 < r: valid Fr
    # points: repeat a small set of real G1 multiples (values don't affect speed)
    from zkdcap_tpu.curves import BN254_G1
    from zkdcap_tpu.curves.device_g1 import encode_points

    base_pts = [BN254_G1.mul(rng.randrange(1, 1 << 60), BN254_G1.g) for _ in range(64)]
    base = encode_points(G1_SPEC, base_pts)
    reps = n // base.shape[0]
    pts = jnp.tile(base, (reps, 1, 1))

    scal_mont = mont.to_mont(BN254_FR, scal)
    t0 = time.time()
    out = msm(pts, scal_mont)
    jax.block_until_ready(out)
    log(f"msm 2^{log_n}: compile+first run {time.time()-t0:.2f}s")
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = msm(pts, scal_mont)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    best = min(times)
    log(f"msm 2^{log_n}: best {best*1e3:.1f} ms -> {n/best:,.0f} points/s")
    return n / best


def bench_ntt(log_n: int, iters: int = 3) -> float:
    import jax
    import jax.numpy as jnp

    from zkdcap_tpu.fields import BN254_FR
    from zkdcap_tpu.fields.params import NUM_LIMBS
    from zkdcap_tpu.ntt import ntt

    n = 1 << log_n
    key = jax.random.PRNGKey(1)
    a = jax.random.randint(key, (n, NUM_LIMBS), 0, 1 << 16, dtype=jnp.int32).astype(jnp.uint32)
    a = a.at[:, NUM_LIMBS - 1].set(0)
    t0 = time.time()
    out = ntt(BN254_FR, a)
    jax.block_until_ready(out)
    log(f"ntt 2^{log_n}: compile+first run {time.time()-t0:.2f}s")
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = ntt(BN254_FR, out)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    best = min(times)
    log(f"ntt 2^{log_n}: best {best*1e3:.1f} ms")
    return best


def _enable_compile_cache():
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    _enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--msm-log-n", type=int, default=20)
    ap.add_argument("--ntt-log-n", type=int, default=22)
    ap.add_argument("--skip-ntt", action="store_true")
    args = ap.parse_args()

    import jax

    log(f"devices: {jax.devices()}")
    pps = bench_msm(args.msm_log_n)
    if not args.skip_ntt:
        bench_ntt(args.ntt_log_n)
    print(
        json.dumps(
            {
                "metric": f"bn254_msm_2^{args.msm_log_n}_points_per_sec_per_chip",
                "value": round(pps),
                "unit": "points/s",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
