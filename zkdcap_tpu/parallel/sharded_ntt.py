"""Multi-chip NTT: four-step factorisation with all-to-all stage exchange.

SURVEY.md §2.3 row 2: "local butterfly stages ...; inter-chip stages via
all-to-all/transpose across the mesh (Ulysses-style axis swap)". The size-N
NTT factors as N = N1 * N2:

  1. view coeffs as A[i, j] (row-major), shard columns j across chips;
  2. NTT_N1 along axis 0 — fully local (each chip owns whole columns);
  3. multiply by twiddles w_N^(i*j) — local;
  4. all_to_all: reshard from columns to rows (the Ulysses axis swap);
  5. NTT_N2 along axis 1 — local;
  6. transpose + all_to_all back to natural order, contiguously sharded.

Output: evaluations in natural order, sharded along the first axis.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..fields import BN254_FR, mont
from ..fields.params import NUM_LIMBS, FieldParams
from ..ntt.ntt import _ntt_impl, twiddle_table
from ..poly.ops import power_table_for

L = NUM_LIMBS


@lru_cache(maxsize=None)
def _sharded_ntt_fn(mesh: Mesh, axis, params: FieldParams, log_n: int):
    """Build (once per (mesh, axis, field, size)) the jitted shard-mapped
    four-step NTT. A fresh closure per call would re-trace and re-compile
    the multi-device executable on every invocation (multi-device programs
    bypass the persistent cache — mesh.bypass_multidevice_compile_cache)."""
    n = 1 << log_n
    log_n1 = log_n // 2
    n1 = 1 << log_n1

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(None), P(None), P(None)),
        out_specs=P(axis),
        check_vma=False,
    )
    def run(a_cols, tw1_, tw2_, w_n_):
        # a arrives sharded along flat index = rows of A^T... we shard COLUMN
        # blocks: caller passes A laid out column-major (n2, n1, L) flattened.
        from .mesh import flat_axis_index

        me = flat_axis_index(axis)
        cols = a_cols.reshape(-1, n1, L)  # (n2/D, n1, L): local columns j
        # step 1: NTT_N1 along axis 1 (the column contents)
        f = lambda x: _ntt_impl(params, x, tw1_, log_n1)
        cols = jax.vmap(f)(cols)
        # step 2: twiddle by w_N^(i * j_global)
        jloc = jnp.arange(cols.shape[0])
        jglob = me * cols.shape[0] + jloc  # (n2/D,)
        i_idx = jnp.arange(n1)
        exps = (jglob[:, None] * i_idx[None, :]) % n  # (n2/D, n1)
        tw = jnp.take(w_n_, exps.reshape(-1), axis=0).reshape(cols.shape)
        cols = mont.mont_mul(params, cols, tw)
        # step 4: all_to_all — reshard from column-blocks to row-blocks
        # local (n2/D, n1, L) -> split axis 1, concat axis 0 -> (n2, n1/D, L)
        rows = jax.lax.all_to_all(cols, axis, split_axis=1, concat_axis=0, tiled=True)
        # now device owns rows i in [me*n1/D, ...): shape (n2, n1/D, L)
        rows = jnp.swapaxes(rows, 0, 1)  # (n1/D, n2, L)
        # step 5: NTT_N2 along axis 1
        f2 = lambda x: _ntt_impl(params, x, tw2_, log_n - log_n1)
        rows = jax.vmap(f2)(rows)
        # output element [i_local, k2] = X[k2*n1 + i_global]
        # natural order flat: index k = k2*n1 + k1 -> array (n2, n1)
        # transpose back: all_to_all to shard k2, then local transpose
        blocks = jax.lax.all_to_all(rows, axis, split_axis=1, concat_axis=0, tiled=True)
        # blocks: (n1, n2/D, L) with full k1 axis, local k2 block
        out = jnp.swapaxes(blocks, 0, 1).reshape(-1, L)  # (n2/D * n1, L) natural
        return out

    return run


def sharded_ntt(
    mesh: Mesh,
    a: jax.Array,
    params: FieldParams = BN254_FR,
    axis: str | tuple = None,
) -> jax.Array:
    """Forward NTT of a (n, L) coefficient array, n = N1*N2 a power of two.

    `axis` may be a single mesh axis or a tuple (multi-host (host, chip)
    meshes) — the all-to-all stage exchange then spans the flattened axes
    (ICI within a host, DCN across hosts)."""
    n = a.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if axis is None:
        axis = mesh.axis_names[0] if len(mesh.axis_names) == 1 else tuple(mesh.axis_names)
    n_dev = mesh.devices.size
    log_n1 = log_n // 2
    n1 = 1 << log_n1
    n2 = n // n1
    assert n2 % n_dev == 0 and n1 % n_dev == 0, "mesh size must divide both factors"

    tw1 = twiddle_table(params, log_n1, False)
    tw2 = twiddle_table(params, log_n - log_n1, False)
    w_n = power_table_for(params, params.nth_root_of_unity(log_n), n)

    # lay input out column-major: A[i,j] = a[i*n2+j]; column-major flat = (j, i)
    a_cm = a.reshape(n1, n2, L).swapaxes(0, 1).reshape(n, L)
    return _sharded_ntt_fn(mesh, axis, params, log_n)(a_cm, tw1, tw2, w_n)
