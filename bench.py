#!/usr/bin/env python
"""Benchmark entry point (driver contract: prints ONE JSON line to stdout).

Headline metric: BN254 Pippenger MSM throughput at 2^20 points on one chip
(BASELINE.md: "BN254 MSM points/sec/chip (2^20 points)"). vs_baseline is
measured against the round-1 self-baseline (363,959 points/s, BENCH.md).

Robustness contract (VERDICT round-3 item 1 — r01 captured rc=124 with no
output, r03 captured value 0 after the watchdog fired during the first MSM
compile):
  * a SMALL MSM (2^16) runs FIRST so `_RESULT` holds a real measured number
    within the first compile-or-cache-hit, long before the 2^20 program is
    touched; if the watchdog fires later, the partial is an honest
    measurement tagged `partial@2^16`;
  * host->device traffic is tiny by design (the axon tunnel moved
    1.3 MB/s when measured): scalars are generated ON DEVICE from one RNG
    key and the point array is tiled on device from an 8 KB base — these
    add two small device programs to the critical path, which is safe
    because they are trivial compiles and cached like everything else;
  * the JSON line is printed and flushed IMMEDIATELY after the 2^20
    measurement; NTT extras follow on stderr only;
  * a watchdog THREAD (not SIGALRM: a signal cannot preempt a blocked
    foreign RPC, a timer thread can) fires at --budget seconds and prints
    the best measurement so far before exiting 0, so an external `timeout`
    can never leave stdout empty;
  * persistent-cache growth is checked and reported on stderr after every
    compile (axon cache writes have been flaky; a compile that produced no
    new cache entry is called out loudly so in-round warming can react).

In-round warming (VERDICT r03 item 1/7): run `python bench.py --warm` after
any kernel change — no watchdog, compiles everything (2^16, 2^20, NTT),
verifies `.jax_cache/` actually grew, and prints a warm/cold summary. The
driver's capped run then hits a warm cache.
"""

import argparse
import json
import os
import sys
import threading
import time

_RESULT = {"value": None, "printed": False, "note": ""}
_R1_BASELINE_PPS = 363_959.0  # round-1 measured points/s (BENCH.md)
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")


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
    log("bench: watchdog fired — emitting partial result")
    emit(_RESULT["value"], note=_RESULT["note"] or "watchdog-partial")
    os._exit(0)


def _cache_stat():
    try:
        names = os.listdir(_CACHE_DIR)
        return len(names), sum(
            os.path.getsize(os.path.join(_CACHE_DIR, f)) for f in names)
    except OSError:
        return 0, 0


def _check_cache_growth(tag: str, before, compile_secs: float):
    n0, b0 = before
    n1, b1 = _cache_stat()
    if compile_secs > 5.0 and n1 <= n0:
        log(f"bench: WARNING {tag}: {compile_secs:.0f}s compile produced NO "
            f"new persistent-cache entry ({n1} entries) — cache writes "
            "flaky, the next cold run will recompile")
    else:
        log(f"bench: cache after {tag}: {n1} entries, {b1/1e6:.1f} MB "
            f"(+{n1-n0} entries)")


def _dev_scalars(n: int, num_limbs: int):
    """Standard-form uint32 16-bit-limb scalars < 2^240 < r, generated ON
    DEVICE from one RNG key (see module docstring for why)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(key):
        bits = jax.random.bits(key, (n, num_limbs), jnp.uint32) & 0xFFFF
        return bits.at[:, num_limbs - 1].set(0)

    return gen(jax.random.PRNGKey(1))


def bench_msm(log_n: int, iters: int = 3, partial_note: str = "") -> float:
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
    # see module docstring)
    base_pts = [BN254_G1.mul(rng.randrange(1, 1 << 60), BN254_G1.g) for _ in range(64)]
    base = jnp.asarray(np.asarray(encode_points(G1_SPEC, base_pts)))
    pts = jnp.tile(base, (n // base.shape[0], 1, 1))

    def run():
        out = msm_device(G1_SPEC, pts, scal_std, min(16384, n))
        # axon's block_until_ready does not force: pull a scalar to host
        return np.asarray(jax.device_get(out[0]))

    before = _cache_stat()
    t0 = time.time()
    run()
    first = time.time() - t0
    log(f"msm 2^{log_n}: compile+first run {first:.2f}s")
    _check_cache_growth(f"msm 2^{log_n}", before, first)
    # give the watchdog a real partial value as soon as one exists
    _RESULT["value"] = n / first
    if partial_note:
        _RESULT["note"] = partial_note
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

    from zkdcap_tpu.fields import BN254_FR
    from zkdcap_tpu.fields.params import NUM_LIMBS
    from zkdcap_tpu.ntt import ntt

    import numpy as np

    n = 1 << log_n
    a = _dev_scalars(n, NUM_LIMBS)
    before = _cache_stat()
    t0 = time.time()
    out = ntt(BN254_FR, a)
    np.asarray(jax.device_get(out[0]))  # axon: block_until_ready does not force
    first = time.time() - t0
    log(f"ntt 2^{log_n}: compile+first run {first:.2f}s")
    _check_cache_growth(f"ntt 2^{log_n}", before, first)
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

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    _enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--msm-log-n", type=int, default=20)
    ap.add_argument("--ntt-log-n", type=int, default=22)
    ap.add_argument("--skip-ntt", action="store_true")
    ap.add_argument("--skip-small", action="store_true",
                    help="skip the 2^16 early-partial stage")
    ap.add_argument("--warm", action="store_true",
                    help="cache-warming mode: no watchdog, compile "
                         "everything, verify cache growth")
    ap.add_argument("--budget", type=float, default=480.0,
                    help="seconds before the watchdog emits a partial result")
    args = ap.parse_args()

    if not args.warm:
        timer = threading.Timer(args.budget, _watchdog)
        timer.daemon = True
        timer.start()

    import jax

    n0, b0 = _cache_stat()
    log(f"devices: {jax.devices()}; cache: {n0} entries {b0/1e6:.1f} MB")
    if not args.skip_small and args.msm_log_n > 16:
        # early honest partial: a real measured rate at 2^16 within the
        # first compile-or-cache-hit (VERDICT r03 item 1)
        bench_msm(16, iters=2, partial_note="partial@2^16")
    pps = bench_msm(args.msm_log_n)
    _RESULT["value"] = pps
    _RESULT["note"] = ""
    emit(pps)
    if not args.warm:
        timer.cancel()
    if not args.skip_ntt:
        bench_ntt(args.ntt_log_n)
    if args.warm:
        n1, b1 = _cache_stat()
        log(f"bench: warm done; cache {n0}->{n1} entries, "
            f"{b0/1e6:.1f}->{b1/1e6:.1f} MB")


if __name__ == "__main__":
    main()
