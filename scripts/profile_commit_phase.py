"""Profile the advice-commit phase components at DCAP scale (k=17, ~40
columns): host->device upload, to_mont, blinding, intt_many, msm_many.
The warm 'advice commit' phase is 8.5 s (BENCH.md round-3 table) — this
breaks it down to find the next lever."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jax.device_get(leaves[0]))
    return x


def main():
    import jax.numpy as jnp

    from zkdcap_tpu.commit import ParamsKZG, gen_srs
    from zkdcap_tpu.fields import BN254_FR, mont
    from zkdcap_tpu.ntt import intt_many

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    cols = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    n = 1 << k
    print(f"devices: {jax.devices()}  k={k} cols={cols}", flush=True)

    params = ParamsKZG(srs=gen_srs(k, cache_dir="params"))

    rng = np.random.default_rng(0)
    host = rng.integers(0, 1 << 16, size=(cols, n, 16), dtype=np.uint32)
    host[:, :, 15] = 0

    for it in range(3):
        t0 = time.time()
        dev = sync(jnp.asarray(host))
        t_up = time.time() - t0
        t0 = time.time()
        adv = sync(mont.to_mont(BN254_FR, dev))
        t_mont = time.time() - t0
        cols_list = [adv[i] for i in range(cols)]
        t0 = time.time()
        coeffs = intt_many(BN254_FR, cols_list)
        sync(coeffs[0])
        t_intt = time.time() - t0
        t0 = time.time()
        pts = params.commit_many(coeffs)
        t_msm = time.time() - t0
        print(f"iter{it}: upload {t_up:.2f}s  to_mont {t_mont:.2f}s  "
              f"intt_many {t_intt:.2f}s  msm_many {t_msm:.2f}s "
              f"({cols * n / t_msm / 1e6:.2f} Mpts/s)", flush=True)


if __name__ == "__main__":
    main()
