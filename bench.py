#!/usr/bin/env python
"""Benchmark entry point (driver contract: prints ONE JSON line to stdout).

Headline metric: BN254 Pippenger MSM throughput at 2^20 points on one chip
(BASELINE.md: "BN254 MSM points/sec/chip (2^20 points)"). vs_baseline is
measured against the round-1 self-baseline (363,959 points/s, BENCH.md).

Robustness contract (VERDICT.md round-1 item 1 — the driver's capture timed
out at rc=124 because a scalar-encoding program compiled for ~6 minutes):
  * scalars are generated HOST-side in standard form (numpy) — the only
    device program in the critical path is the MSM kernel itself;
  * the JSON line is printed and flushed IMMEDIATELY after the MSM
    measurement; NTT extras follow on stderr only;
  * a SIGALRM watchdog fires at --budget seconds (default 480) and prints
    the best measurement so far (or a sentinel value) before exiting 0, so
    an external `timeout` can never leave stdout empty.
"""

import argparse
import json
import os
import sys
import threading
import time

_RESULT = {"value": None, "printed": False}
_R1_BASELINE_PPS = 363_959.0  # round-1 measured points/s (BENCH.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(pps: float | None, note: str = ""):
    """Print the single stdout JSON line (idempotent)."""
    if _RESULT["printed"]:
        return
    _RESULT["printed"] = True
    obj = {
        "metric": "bn254_msm_2^20_points_per_sec_per_chip",
        "value": round(pps) if pps else 0,
        "unit": "points/s",
        "vs_baseline": round(pps / _R1_BASELINE_PPS, 3) if pps else 0.0,
    }
    if note:
        obj["note"] = note
    print(json.dumps(obj), flush=True)


def _watchdog():
    # a THREAD, not SIGALRM: a signal handler cannot preempt a blocked
    # foreign call (the axon remote-compile RPC), a timer thread can.
    log("bench: watchdog fired — emitting partial result")
    emit(_RESULT["value"], note="watchdog-partial")
    os._exit(0)


def _np_scalars(n: int, num_limbs: int):
    """Standard-form uint32 16-bit-limb scalars < 2^240 < r, generated on
    host (no device Montgomery-encode program needed)."""
    import numpy as np

    rng = np.random.default_rng(1)
    s = rng.integers(0, 1 << 16, size=(n, num_limbs), dtype=np.uint32)
    s[:, num_limbs - 1] = 0
    return s


def _dev_scalars(n: int, num_limbs: int):
    """Same distribution as _np_scalars but generated ON DEVICE: the axon
    tunnel's host->device bandwidth is unreliable (measured 1.3 MB/s on
    2026-08-20 — a 64 MB scalar upload alone would eat 50s of the driver's
    budget), so the bench ships only an RNG key."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(key):
        bits = jax.random.bits(key, (n, num_limbs), jnp.uint32) & 0xFFFF
        return bits.at[:, num_limbs - 1].set(0)

    return gen(jax.random.PRNGKey(1))


def bench_msm(log_n: int, iters: int = 3) -> float:
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np

    from zkdcap_tpu.curves import BN254_G1
    from zkdcap_tpu.curves.device_g1 import G1_SPEC, encode_points
    from zkdcap_tpu.fields.params import NUM_LIMBS
    from zkdcap_tpu.msm.pippenger import msm_device

    n = 1 << log_n
    rng = random.Random(1)
    scal_std = _dev_scalars(n, NUM_LIMBS)
    # points: repeat a small set of real G1 multiples (values don't affect
    # speed); upload only the 8 KB base and tile ON DEVICE (tunnel slowness,
    # see _dev_scalars)
    base_pts = [BN254_G1.mul(rng.randrange(1, 1 << 60), BN254_G1.g) for _ in range(64)]
    base = jnp.asarray(np.asarray(encode_points(G1_SPEC, base_pts)))
    pts = jnp.tile(base, (n // base.shape[0], 1, 1))

    def run():
        out = msm_device(G1_SPEC, pts, scal_std, min(16384, n))
        # axon's block_until_ready does not force: pull a scalar to host
        return np.asarray(jax.device_get(out[0]))

    t0 = time.time()
    run()
    first = time.time() - t0
    log(f"msm 2^{log_n}: compile+first run {first:.2f}s")
    # give the watchdog a real partial value as soon as one exists
    _RESULT["value"] = n / first
    times = []
    for _ in range(iters):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
        _RESULT["value"] = n / min(times)
    best = min(times)
    log(f"msm 2^{log_n}: best {best*1e3:.1f} ms -> {n/best:,.0f} points/s")
    return n / best


def bench_ntt(log_n: int, iters: int = 3) -> float:
    import jax
    import jax.numpy as jnp

    from zkdcap_tpu.fields import BN254_FR
    from zkdcap_tpu.fields.params import NUM_LIMBS
    from zkdcap_tpu.ntt import ntt

    import numpy as np

    n = 1 << log_n
    a = _dev_scalars(n, NUM_LIMBS)
    t0 = time.time()
    out = ntt(BN254_FR, a)
    np.asarray(jax.device_get(out[0]))  # axon: block_until_ready does not force
    log(f"ntt 2^{log_n}: compile+first run {time.time()-t0:.2f}s")
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = ntt(BN254_FR, out)
        np.asarray(jax.device_get(out[0]))
        times.append(time.time() - t0)
    best = min(times)
    log(f"ntt 2^{log_n}: best {best*1e3:.1f} ms")
    return best


def _enable_compile_cache():
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
    ap.add_argument("--budget", type=float, default=480.0,
                    help="seconds before the watchdog emits a partial result")
    args = ap.parse_args()

    timer = threading.Timer(args.budget, _watchdog)
    timer.daemon = True
    timer.start()

    import jax

    log(f"devices: {jax.devices()}")
    pps = bench_msm(args.msm_log_n)
    _RESULT["value"] = pps
    emit(pps)
    timer.cancel()
    if not args.skip_ntt:
        bench_ntt(args.ntt_log_n)


if __name__ == "__main__":
    main()
