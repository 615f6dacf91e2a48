"""Multi-chip Pippenger MSM: data-parallel points, EC-reduced partials.

SURVEY.md §2.3 row 1: "point batches sharded across chips (data parallel
over points); per-window bucket sums reduced ... over ICI". Each chip runs
the full single-chip Pippenger (msm/pippenger.py) on its point shard; the
per-shard partial results (one projective point each) are combined with a
log-depth complete-addition fold. EC addition is not a ring sum, so the
reduction is an explicit gathered fold rather than a psum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curves.device_g1 import CurveSpec, G1_SPEC, ec_add, ec_select, ec_inf
from ..fields import BN254_FR, mont
from ..fields.params import NUM_LIMBS
from ..msm.pippenger import msm_device

L = NUM_LIMBS


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
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def local_msm(pts, scal):
        X, Y, Z = msm_device(spec, pts, scal, lanes)
        part = jnp.stack([X, Y, Z])[None]  # (1, 3, L) per shard
        parts = jax.lax.all_gather(part, axis, axis=0, tiled=True)  # (n_dev, 3, L)
        return fold(parts)  # replicated (3, L)

    out = local_msm(points, scalars_std)
    return (out[0], out[1], out[2])
