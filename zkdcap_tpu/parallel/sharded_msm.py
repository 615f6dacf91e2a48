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

from ..curves.device_g1 import (
    CurveSpec,
    G1_SPEC,
    ec_add,
    ec_double,
    ec_inf,
    ec_select,
)
from ..fields import BN254_FR, mont
from ..fields.params import NUM_LIMBS
from ..msm.pippenger import msm_device

L = NUM_LIMBS

# Per-shard point counts at or below this use the double-and-add ladder:
# the full Pippenger program (sorts, scans, pallas) costs MINUTES of XLA
# compile per (shape, mesh) — and multi-device executables cannot be
# persistently cached (see tests/conftest.py) — while the ladder is a tiny
# fori_loop that compiles in seconds and is plenty fast at these sizes.
SMALL_MSM_MAX = 512


def _small_msm(spec: CurveSpec, points, scalars_std):
    """O(256·N) double-and-add MSM: per bit, a masked log-depth tree sum of
    the points, Horner-accumulated over the 256 scalar bits. Exact same
    group element as msm_device (complete formulas throughout)."""
    f = spec.field
    N = points.shape[0]
    npad = max(1 << (N - 1).bit_length(), 1) if N > 1 else 1
    Px, Py = points[:, 0], points[:, 1]
    pt_inf = jnp.logical_and(mont.is_zero(Px), mont.is_zero(Py))
    one = mont.one_mont(f, (N,))
    Py = jnp.where(pt_inf[:, None], one, Py)
    Pz = jnp.where(pt_inf[:, None], jnp.zeros_like(one), one)
    if npad != N:
        inf = ec_inf(spec, (npad - N,))
        Px = jnp.concatenate([Px, inf[0]])
        Py = jnp.concatenate([Py, inf[1]])
        Pz = jnp.concatenate([Pz, inf[2]])
        scalars_std = jnp.concatenate(
            [scalars_std, jnp.zeros((npad - N, L), jnp.uint32)]
        )

    def step(t, acc):
        j = 255 - t  # MSB first
        acc = ec_double(spec, acc)
        limb = jnp.take(scalars_std, j // 16, axis=1)  # (npad, L) -> (npad,)
        bit = (limb >> (j % 16).astype(jnp.uint32)) & 1
        sub = ec_select(bit.astype(bool), (Px, Py, Pz), ec_inf(spec, (npad,)))
        m = npad
        while m > 1:
            half = m // 2
            sub = ec_add(
                spec,
                tuple(c[:half] for c in sub),
                tuple(c[half : 2 * half] for c in sub),
            )
            m = half
        return ec_add(spec, acc, tuple(c[0] for c in sub))

    return jax.lax.fori_loop(0, 256, step, ec_inf(spec))


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
        if pts.shape[0] <= SMALL_MSM_MAX:
            X, Y, Z = _small_msm(spec, pts, scal)
        else:
            X, Y, Z = msm_device(spec, pts, scal, lanes)
        part = jnp.stack([X, Y, Z])[None]  # (1, 3, L) per shard
        parts = jax.lax.all_gather(part, axis, axis=0, tiled=True)  # (n_dev, 3, L)
        return fold(parts)  # replicated (3, L)

    out = local_msm(points, scalars_std)
    return (out[0], out[1], out[2])
