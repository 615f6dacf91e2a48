#!/usr/bin/env python
"""Calibrate VPU u32 op throughput vs the Montgomery-mul kernels.

Answers two questions that decide the field-mul kernel design (ROADMAP 3):
  1. what is the achievable u32 multiply / add / shift rate inside a Pallas
     kernel on this chip (is mul 1:1 with add or 1:4)?
  2. how many effective "u32 ops" does the current 16x16 CIOS kernel spend
     per field mul (vs its ~2.5k static count), i.e. how much headroom a
     13-bit redundant-limb rewrite has?

Each probe kernel streams (L, SUB, 128) u32 blocks and applies K rounds of
the probed op chain entirely in VMEM, so the measured time is compute-bound.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, ".")
from zkdcap_tpu.fields import BN254_FR, mont  # noqa: E402
from zkdcap_tpu.fields.pallas_mont import mont_mul_lm  # noqa: E402

L = 16
LANE = 128
SUB = 32
ROWS = 64  # grid rows
M = ROWS * SUB * LANE  # lanes per limb plane


def force(out):
    np.asarray(jax.device_get(jnp.ravel(out)[:1]))


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    force(out)
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        force(out)
        ts.append(time.time() - t0)
    dt = min(ts)
    return dt, out


def probe_call(body, n_rounds):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        acc = x
        for _ in range(n_rounds):
            acc = body(acc, x)
        o_ref[...] = acc

    spec = pl.BlockSpec((L, SUB, LANE), lambda i: (0, i, 0))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, ROWS * SUB, LANE), jnp.uint32),
        grid=(ROWS,),
        in_specs=[spec],
        out_specs=spec,
    )


def main():
    print(f"backend={jax.default_backend()} M={M} lanes x {L} limbs", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, 1 << 16, (L, ROWS * SUB, LANE), dtype=np.uint32))

    K = 64
    total = L * M * K  # ops per call

    mul_fn = jax.jit(probe_call(lambda a, b: a * b + jnp.uint32(1), K))
    dt, _ = timeit("mul", mul_fn, x)
    print(f"u32 mul+add chain   : {total/dt/1e12:8.3f} T op-pairs/s ({dt*1e3:.1f} ms)", flush=True)

    add_fn = jax.jit(probe_call(lambda a, b: (a + b) ^ b, K))
    dt, _ = timeit("add", add_fn, x)
    print(f"u32 add+xor chain   : {total/dt/1e12:8.3f} T op-pairs/s ({dt*1e3:.1f} ms)", flush=True)

    sh_fn = jax.jit(probe_call(lambda a, b: (a >> 7) + b, K))
    dt, _ = timeit("shift", sh_fn, x)
    print(f"u32 shr+add chain   : {total/dt/1e12:8.3f} T op-pairs/s ({dt*1e3:.1f} ms)", flush=True)

    # the real kernel: elementwise Montgomery mul at 16x16
    a = mont.encode_ints(BN254_FR, list(rng.integers(1, 1 << 60, M)))
    b = mont.encode_ints(BN254_FR, list(rng.integers(1, 1 << 60, M)))
    at, bt = a.T.copy(), b.T.copy()
    f = jax.jit(lambda u, v: mont_mul_lm(BN254_FR, u, v))
    dt, _ = timeit("mont_mul_lm", f, at, bt)
    print(f"mont_mul_lm 16x16   : {M/dt/1e6:8.1f} M fieldmul/s ({dt*1e3:.1f} ms)", flush=True)
    # implied op budget per mul at the measured mul-chain rate
    print("done", flush=True)


if __name__ == "__main__":
    main()
