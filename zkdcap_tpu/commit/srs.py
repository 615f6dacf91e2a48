"""Unsafe dev SRS (powers-of-tau), computed on device and cached on disk.

Equivalent of halo2's `gen_srs` dev trusted setup (reference uses it at
`circuits/src/sgx_dcap_verifier.rs:799` and `crates/p256-ecdsa/src/base.rs:118,134`;
cache file `params/kzg_bn254_18.srs`, SURVEY.md §5.4). Like the reference,
tau is deterministic and NOT a secure ceremony — test/dev only.

The 2^k G1 points [tau^i]G are produced on device: 256 sequential steps of a
batched conditional EC add over the bit-decomposed scalars (one step per
scalar bit), then one batched Fermat inversion to normalise to affine.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import BN254_G1
from ..curves.device_g1 import (
    G1_SPEC,
    CurveSpec,
    ec_add,
    ec_inf,
    ec_select,
)
from ..curves.pairing import G2_GEN, g2_mul
from ..fields import BN254_FQ, BN254_FR, mont
from ..fields.params import NUM_LIMBS

L = NUM_LIMBS
DEV_SEED = b"zkdcap-tpu-dev-srs-v1"


def _dev_tau() -> int:
    return int.from_bytes(hashlib.blake2b(DEV_SEED).digest(), "little") % BN254_FR.p


def ints_to_limbs_np(vals: list[int]) -> np.ndarray:
    """Fast bulk python-int -> uint32[n,16] standard-form limbs."""
    buf = b"".join(v.to_bytes(32, "little") for v in vals)
    return np.frombuffer(buf, dtype=np.uint16).reshape(len(vals), L).astype(np.uint32)


@partial(jax.jit, static_argnums=0)
def _powers_of_base(spec: CurveSpec, scalars_std: jax.Array, base_bits: jax.Array):
    """[s_i]G for each scalar: 256 masked adds against precomputed [2^j]G.

    scalars_std: uint32[n,16]; base_bits: uint32[256,2,L] ([2^j]G affine mont).
    Returns projective point batch.
    """
    n = scalars_std.shape[0]
    one = mont.one_mont(spec.field, (n,))

    def body(j, acc):
        limb = jax.lax.dynamic_index_in_dim(
            scalars_std, jnp.right_shift(j, 4), axis=1, keepdims=False
        )
        bit = (limb >> (j & 15).astype(jnp.uint32)) & jnp.uint32(1)
        bx = jax.lax.dynamic_index_in_dim(base_bits, j, 0, keepdims=False)
        Gj = (
            jnp.broadcast_to(bx[0], (n, L)),
            jnp.broadcast_to(bx[1], (n, L)),
            one,
        )
        added = ec_add(spec, acc, Gj)
        return ec_select(bit == 1, added, acc)

    acc = jax.lax.fori_loop(0, 256, body, ec_inf(spec, (n,)))
    return acc


@partial(jax.jit, static_argnums=0)
def _to_affine_batch(spec: CurveSpec, P):
    """Projective -> packed affine (n,2,L); infinity -> (0,0)."""
    X, Y, Z = P
    zinv = mont.mont_inv(spec.field, Z)
    x = mont.mont_mul(spec.field, X, zinv)
    y = mont.mont_mul(spec.field, Y, zinv)
    inf = mont.is_zero(Z)
    x = jnp.where(inf[..., None], 0, x)
    y = jnp.where(inf[..., None], 0, y)
    return jnp.stack([x, y], axis=-2)


@dataclasses.dataclass
class SRS:
    k: int
    g1_powers: jax.Array  # uint32[2^k, 2, L] Montgomery affine [tau^i]G
    g2: tuple  # G2 generator (host Fq2 affine)
    s_g2: tuple  # [tau]G2
    g1: tuple[int, int]  # host generator

    @property
    def n(self) -> int:
        return 1 << self.k


def gen_srs(k: int, cache_dir: str = "params") -> SRS:
    """Deterministic dev SRS with disk cache (gen_srs equivalent)."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"kzg_bn254_{k}.srs.npz")
    tau = _dev_tau()
    s_g2 = g2_mul(tau, G2_GEN)
    if os.path.exists(path):
        data = np.load(path)
        g1_powers = jnp.asarray(data["g1_powers"])
    else:
        n = 1 << k
        taus = [1] * n
        for i in range(1, n):
            taus[i] = taus[i - 1] * tau % BN254_FR.p
        scal = jnp.asarray(ints_to_limbs_np(taus))
        # [2^j]G for j < 256 (host)
        mults = []
        pt = BN254_G1.g
        for _ in range(256):
            mults.append(pt)
            pt = BN254_G1.add(pt, pt)
        from ..curves.device_g1 import encode_points

        base_bits = encode_points(G1_SPEC, mults)
        proj = _powers_of_base(G1_SPEC, scal, base_bits)
        g1_powers = _to_affine_batch(G1_SPEC, proj)
        np.savez_compressed(path, g1_powers=np.asarray(jax.device_get(g1_powers)))
    return SRS(k=k, g1_powers=g1_powers, g2=G2_GEN, s_g2=s_g2, g1=BN254_G1.g)
