"""Multi-chip Pippenger MSM: data-parallel points, EC-reduced partials.

SURVEY.md §2.3 row 1: "point batches sharded across chips (data parallel
over points); per-window bucket sums reduced ... over ICI". Each chip runs
the full single-chip Pippenger (msm/pippenger.py) on its point shard; the
per-shard partial results (one projective point each) are combined with a
log-depth complete-addition fold. EC addition is not a ring sum, so the
reduction is an explicit gathered fold rather than a psum.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..curves.device_g1 import (
    CurveSpec,
    G1_SPEC,
    ec_add,
)
from ..fields import BN254_FR, mont
from ..fields.params import NUM_LIMBS
from ..msm.pippenger import SMALL_MSM_MAX, msm_device, msm_ladder

L = NUM_LIMBS


@lru_cache(maxsize=None)
def _sharded_msm_fn(mesh: Mesh, axis, spec: CurveSpec, lanes: int):
    """Build (once per (mesh, axis, spec, lanes)) the jitted shard-mapped
    MSM program. A fresh closure per call would make JAX re-trace AND
    re-compile the multi-device executable for EVERY commitment — ~30 s of
    XLA:CPU compile each on the virtual test mesh (multi-device programs
    bypass the persistent cache, see mesh.bypass_multidevice_compile_cache).
    Cached, a proof's dozens of same-shape commitments compile exactly once."""

    # log-depth EC fold over the gathered partials (replicated small data)
    def fold(parts):
        m = parts.shape[0]
        while m > 1:
            half = m // 2
            a = (parts[:half, 0], parts[:half, 1], parts[:half, 2])
            b = (parts[half : 2 * half, 0], parts[half : 2 * half, 1], parts[half : 2 * half, 2])
            s = ec_add(spec, a, b)
            merged = jnp.stack(s, axis=1)
            if m % 2:
                merged = jnp.concatenate([merged, parts[2 * half :]], axis=0)
            parts = merged
            m = parts.shape[0]
        return parts[0]

    # The all_gather + fold run INSIDE the shard_map: one compiled program,
    # with the cross-shard combine expressed as a proper XLA collective.
    # (Folding the sharded partials with eager jnp ops instead compiles
    # ad-hoc multi-device programs whose CPU-backend rendezvous is fragile
    # under load — observed as flaky SIGABRTs in the full suite.)
    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def local_msm(pts, scal):
        if pts.shape[0] <= SMALL_MSM_MAX:
            X, Y, Z = msm_ladder(spec, pts, scal)
        else:
            X, Y, Z = msm_device(spec, pts, scal, lanes)
        part = jnp.stack([X, Y, Z])[None]  # (1, 3, L) per shard
        parts = jax.lax.all_gather(part, axis, axis=0, tiled=True)  # (n_dev, 3, L)
        return fold(parts)  # replicated (3, L)

    return local_msm


def sharded_msm(
    mesh: Mesh,
    points: jax.Array,
    scalars_mont: jax.Array,
    spec: CurveSpec = G1_SPEC,
    axis: str | tuple = None,
):
    """points uint32[N,2,L] affine Montgomery, scalars (N,L) Montgomery Fr.

    N must be divisible by the mesh size. Returns a single projective Point
    (host-replicated arrays of shape (L,)). `axis` may be one axis name or
    a tuple (e.g. ("host", "chip") on a multi-host mesh) — points shard
    over the flattened axes.
    """
    if axis is None:
        axis = mesh.axis_names[0] if len(mesh.axis_names) == 1 else tuple(mesh.axis_names)
    n_dev = mesh.devices.size
    N = points.shape[0]
    assert N % n_dev == 0, f"N={N} not divisible by {n_dev} devices"
    local = N // n_dev
    lanes = min(8192, 1 << max((local - 1).bit_length(), 0))

    scalars_std = mont.from_mont(BN254_FR, scalars_mont)

    out = _sharded_msm_fn(mesh, axis, spec, lanes)(points, scalars_std)
    return (out[0], out[1], out[2])
