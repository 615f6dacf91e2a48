"""Pippenger MSM differential tests vs naive host oracle."""

import random

import pytest

from zkdcap_tpu.curves import BN254_G1
from zkdcap_tpu.curves.device_g1 import G1_SPEC, encode_points
from zkdcap_tpu.fields import BN254_FR, mont
from zkdcap_tpu.msm import msm
from zkdcap_tpu.msm.pippenger import msm_host

RNG = random.Random(11)


def run_case(scalars, pts):
    dpts = encode_points(G1_SPEC, pts)
    dscal = mont.encode_ints(BN254_FR, scalars)
    got = msm_host(dpts, dscal)
    expect = BN254_G1.msm(scalars, pts)
    assert got == expect, f"{got} != {expect}"


def test_msm_small():
    n = 5
    pts = [BN254_G1.mul(RNG.randrange(1, BN254_G1.n), BN254_G1.g) for _ in range(n)]
    scalars = [RNG.randrange(BN254_G1.n) for _ in range(n)]
    run_case(scalars, pts)


def test_msm_edge_scalars():
    g = BN254_G1.g
    pts = [g, BN254_G1.mul(5, g), BN254_G1.mul(7, g), None, BN254_G1.mul(9, g)]
    scalars = [0, 1, BN254_G1.n - 1, 12345, 0xFF]
    run_case(scalars, pts)


def test_msm_pow2():
    n = 64
    pts = [BN254_G1.mul(RNG.randrange(1, BN254_G1.n), BN254_G1.g) for _ in range(n)]
    scalars = [RNG.randrange(BN254_G1.n) for _ in range(n)]
    run_case(scalars, pts)


@pytest.mark.slow
def test_msm_device_full_program():
    """Call msm_device DIRECTLY (bypassing msm()'s small-N ladder cutoff) so
    the split-weight stage-6b aggregation runs in the suite (ADVICE r03:
    every other suite path routes to msm_ladder)."""
    import jax.numpy as jnp
    import numpy as np

    from zkdcap_tpu.curves.device_g1 import decode_points
    from zkdcap_tpu.msm.pippenger import msm_device

    n = 512
    pts = [BN254_G1.mul(RNG.randrange(1, BN254_G1.n), BN254_G1.g) for _ in range(n)]
    scalars = [RNG.randrange(BN254_G1.n) for _ in range(n)]
    scalars[0] = 0
    pts[1] = None  # encoded infinity
    scalars[2] = BN254_G1.n - 1
    dpts = jnp.asarray(np.asarray(encode_points(G1_SPEC, pts)))
    dscal = mont.from_mont(BN254_FR, mont.encode_ints(BN254_FR, scalars))
    out = msm_device(G1_SPEC, dpts, dscal, 256)
    got = decode_points(G1_SPEC, tuple(r[None] for r in out))[0]
    assert got == BN254_G1.msm(scalars, pts)


def test_msm_repeated_digits():
    # many equal digits stress the segmented reduction paths
    n = 48
    pts = [BN254_G1.mul(i + 1, BN254_G1.g) for i in range(n)]
    scalars = [0x0101 for _ in range(n // 2)] + [RNG.randrange(1 << 16) for _ in range(n - n // 2)]
    run_case(scalars, pts)
