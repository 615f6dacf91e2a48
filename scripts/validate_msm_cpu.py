#!/usr/bin/env python
"""CPU differential check of the FULL msm_device program (incl. the
split-weight aggregation) vs the naive host oracle at a small N.

The pallas kernels fall back to their jnp paths off-TPU, so this exercises
the same dataflow graph XLA compiles for the chip. N is kept small because
the full Pippenger program costs minutes of XLA:CPU compile time.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, ".")

# the image's sitecustomize registers the axon plugin in every process;
# the env var alone does not stick (see tests/conftest.py)
import jax

jax.config.update("jax_platforms", "cpu")

import random

import jax.numpy as jnp
import numpy as np

from zkdcap_tpu.curves import BN254_G1
from zkdcap_tpu.curves.device_g1 import G1_SPEC, decode_points, encode_points
from zkdcap_tpu.fields import BN254_FR, mont
from zkdcap_tpu.msm.pippenger import msm_device

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
rng = random.Random(3)
pts = [BN254_G1.mul(rng.randrange(1, BN254_G1.n), BN254_G1.g) for _ in range(N)]
scalars = [rng.randrange(BN254_G1.n) for _ in range(N)]
# stress edges: zero scalar, encoded infinity, max bucket digit runs
scalars[0] = 0
pts[1] = None
scalars[2] = BN254_G1.n - 1

dpts = jnp.asarray(np.asarray(encode_points(G1_SPEC, pts)))
dscal = mont.from_mont(BN254_FR, mont.encode_ints(BN254_FR, scalars))
lanes = min(256, N)
out = msm_device(G1_SPEC, dpts, dscal, lanes)
got = decode_points(G1_SPEC, tuple(r[None] for r in out))[0]
expect = BN254_G1.msm(scalars, pts)
assert got == expect, f"mismatch: {got} != {expect}"
print(f"msm_device N={N} lanes={lanes}: OK (split-weight aggregation)")
