"""Automated per-kernel roofline report (SURVEY.md §5.1, BENCH.md table).

Measures the three hot kernels (Montgomery mul, NTT, Pippenger MSM) on the
current backend, derives achieved throughput, and compares against a
speed-of-light model of the chip so regressions and headroom are machine-
visible instead of hand-derived. Emits a human table to stderr and one
JSON object per kernel to stdout (and the zkdcap_tpu.metrics registry).

Model constants are for TPU v5e (per chip): HBM ~819 GB/s. The VPU rate
default was recalibrated in round 5 from on-chip kernel splits (one CG
NTT pass sustains ~1.0e12 u32 op/s; see BENCH.md "Speed-of-light model
recalibrated"): the nominal 8x128x4x0.94 GHz figure overstates effective
integer throughput on these kernels by ~4x. Override via env
ZKDCAP_HBM_GBPS / ZKDCAP_VPU_GOPS for other parts.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from zkdcap_tpu import metrics
from zkdcap_tpu.fields import BN254_FR, mont
from zkdcap_tpu.fields.params import NUM_LIMBS

HBM_GBPS = float(os.environ.get("ZKDCAP_HBM_GBPS", 819.0))
# measured-effective u32 rate (round-5 recalibration), not the nominal
# 8 * 128 * 4 * 0.94 GHz ~ 3.8e3 GOPS
VPU_GOPS = float(os.environ.get("ZKDCAP_VPU_GOPS", 1000.0))

# op-count model (per element): 16x16-limb CIOS ~= 1.1k int32 VPU ops
CIOS_OPS = 1100.0


def force(x):
    # pull ONE element, not the full array: device_get of a 2^22-limb
    # result would time the axon tunnel (~GB/s), not the kernel
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))


def timeit(fn, *args, iters=3):
    force(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        force(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def report(name, seconds, items, nbytes, sol_s, note=""):
    rec = metrics.record(f"roofline.{name}", seconds, items=items, nbytes=nbytes,
                         sol_s=round(sol_s, 6),
                         pct_of_sol=round(100 * sol_s / seconds, 1) if seconds else 0,
                         note=note)
    print(json.dumps(rec), flush=True)
    print(f"{name:28s} {seconds*1e3:9.1f} ms   SoL {sol_s*1e3:7.1f} ms   "
          f"{100*sol_s/seconds:5.1f}% of SoL  {note}", file=sys.stderr, flush=True)


def bench_mont_mul(log_n=21):
    n = 1 << log_n
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, (n, NUM_LIMBS), dtype=np.uint32))
    f = jax.jit(lambda x, y: mont.mont_mul(BN254_FR, x, y).sum(dtype=jnp.uint32))
    s = timeit(f, a, a)
    nbytes = 3 * n * NUM_LIMBS * 4
    sol = max(n * CIOS_OPS / (VPU_GOPS * 1e9), nbytes / (HBM_GBPS * 1e9))
    report(f"mont_mul_2^{log_n}", s, n, nbytes, sol,
           note="compute model: 1.1k VPU ops/mul")


def bench_ntt(log_n=22):
    from zkdcap_tpu.ntt import ntt

    n = 1 << log_n
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, 1 << 16, (n, NUM_LIMBS), dtype=np.uint32))
    a = a.at[:, NUM_LIMBS - 1].set(0)
    # call the public ntt() unwrapped (it jits internally): an outer jit
    # re-traces the four-step into one fused program whose layouts XLA
    # chooses differently (measured 3x slower than the production path)
    s = timeit(lambda x: ntt(BN254_FR, x), a)
    muls = n // 2 * log_n
    nbytes = 2 * 2 * n * NUM_LIMBS * 4  # two fused passes, r+w each
    sol = max(muls * CIOS_OPS / (VPU_GOPS * 1e9), nbytes / (HBM_GBPS * 1e9))
    report(f"ntt_2^{log_n}", s, n, nbytes, sol,
           note=f"{muls/1e6:.0f}M butterfly muls")


def bench_msm(log_n=20):
    from zkdcap_tpu.curves import BN254_G1
    from zkdcap_tpu.curves.device_g1 import G1_SPEC, encode_points
    from zkdcap_tpu.msm.pippenger import NUM_WINDOWS, msm_device

    n = 1 << log_n
    rng = np.random.default_rng(2)
    import random

    r = random.Random(7)
    base = np.asarray(encode_points(
        G1_SPEC, [BN254_G1.mul(r.randrange(1, 1 << 60), BN254_G1.g) for _ in range(64)]))
    pts = jnp.asarray(np.tile(base, (n // 64, 1, 1)))
    scal = jnp.asarray(rng.integers(0, 1 << 16, (n, NUM_LIMBS), dtype=np.uint32))
    scal = scal.at[:, NUM_LIMBS - 1].set(0)

    # msm_device is jitted itself; calling it unwrapped reuses the exact
    # production program (an outer jit would re-fuse and recompile)
    s = timeit(lambda p, sc: msm_device(G1_SPEC, p, sc, min(16384, n)),
               pts, scal)
    adds = n * NUM_WINDOWS
    # compute floor: W mixed adds/point at 13 CIOS muls; memory floor: one
    # 64 B packed row gather per (point, window)
    sol = max(adds * 13 * CIOS_OPS / (VPU_GOPS * 1e9),
              adds * 64 / (HBM_GBPS * 1e9))
    report(f"msm_2^{log_n}", s, n, adds * 64, sol,
           note=f"{n/s:,.0f} pts/s, {NUM_WINDOWS} windows")


if __name__ == "__main__":
    which = sys.argv[1:] or ["mont", "ntt", "msm"]
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    if "mont" in which:
        bench_mont_mul()
    if "ntt" in which:
        bench_ntt()
    if "msm" in which:
        bench_msm()
