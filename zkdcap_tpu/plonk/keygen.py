"""Keygen: vk (commitments) + pk (device-resident evaluated polynomials).

halo2 `keygen_vk`/`keygen_pk` equivalent (reference calls at
`circuits/src/sgx_dcap_verifier.rs:803-807`, SURVEY.md §3.1). The pk is laid
out as device arrays ready for the prover: Lagrange, coefficient and
extended-coset forms of every fixed/sigma polynomial, plus the
extended-domain Z_H^{-1} and Lagrange-selector vectors (l_0, l_last,
l_blind) the quotient computation needs.

Permutation: copy constraints are merged with union-find, each equivalence
class becomes one cycle, and sigma_i(omega^j) = delta^{i'} omega^{j'} values
are gathered on device from power tables.
"""

from __future__ import annotations

import dataclasses
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from ..commit.kzg import ParamsKZG
from ..fields import BN254_FR, mont
from ..fields.params import NUM_LIMBS
from ..ntt import Domain, intt
from ..poly.ops import power_table_for
from .cs import Column, ConstraintSystem
from .expression import Advice, Fixed, Instance

R = BN254_FR.p
GENERATOR = 7
DELTA = pow(GENERATOR, 1 << BN254_FR.two_adicity, R)


def collect_queries(cs: ConstraintSystem):
    """Deterministic (column, rotation) query lists per column kind."""
    adv: set[tuple[int, int]] = set()
    fix: set[tuple[int, int]] = set()
    ins: set[tuple[int, int]] = set()

    def walk(e):
        from .expression import Negated, Product, Scaled, Sum

        if isinstance(e, Advice):
            adv.add((e.index, e.rotation))
        elif isinstance(e, Fixed):
            fix.add((e.index, e.rotation))
        elif isinstance(e, Instance):
            ins.add((e.index, e.rotation))
        elif isinstance(e, Negated):
            walk(e.inner)
        elif isinstance(e, Scaled):
            walk(e.inner)
        elif isinstance(e, Sum) or isinstance(e, Product):
            walk(e.a)
            walk(e.b)

    for g in cs.gates:
        for p in g.polys:
            walk(p)
    for lk in cs.lookups:
        for e in lk.inputs + lk.tables:
            walk(e)
    # permutation columns are opened at rotation 0
    for col in cs.permutation_columns:
        if col.kind == "advice":
            adv.add((col.index, 0))
        elif col.kind == "fixed":
            fix.add((col.index, 0))
        else:
            ins.add((col.index, 0))
    # every committed column needs at least one query to be bound
    for i in range(cs.num_advice):
        adv.add((i, 0))
    for i in range(cs.num_fixed):
        fix.add((i, 0))
    return sorted(adv), sorted(fix), sorted(ins)


class _UnionFind:
    def __init__(self, n):
        self.p = list(range(n))

    def find(self, x):
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[ra] = rb


@dataclasses.dataclass
class VerifyingKey:
    k: int
    cs: ConstraintSystem
    fixed_commitments: list
    permutation_commitments: list
    transcript_kind: str = "blake2b"

    def transcript_repr(self) -> int:
        """Binds k, every commitment, AND the full constraint system
        (gate/lookup expression ASTs, permutation columns, column counts) —
        halo2's pinned-vk hash analog (ADVICE round-1 fix: counts alone are
        not binding)."""
        h = hashlib.blake2b(b"zkdcap-tpu-vk-v2")
        h.update(self.k.to_bytes(4, "little"))
        from ..transcript import serialize_point

        for c in self.fixed_commitments + self.permutation_commitments:
            h.update(serialize_point(c))
        h.update(self.cs.canonical_bytes())
        return int.from_bytes(h.digest(), "little") % R


@dataclasses.dataclass
class ProvingKey:
    vk: VerifyingKey
    domain: Domain
    fixed_values: list[list[int]]  # host ints, per column (for mock/debug)
    fixed_lagrange: list  # device (n, L) Montgomery
    fixed_coeff: list
    fixed_extended: list
    sigma_lagrange: list
    sigma_coeff: list
    sigma_extended: list
    l0_ext: jax.Array
    llast_ext: jax.Array
    lblind_ext: jax.Array
    zh_inv_ext: jax.Array  # 1 / Z_H on the extended coset

    @property
    def cs(self) -> ConstraintSystem:
        return self.vk.cs

    @property
    def k(self) -> int:
        return self.vk.k


def _one_hot_poly(domain: Domain, rows: list[int]) -> jax.Array:
    v = np.zeros((domain.n, NUM_LIMBS), dtype=np.uint32)
    arr = jnp.asarray(v)
    onem = mont.one_mont(BN254_FR)
    for r_ in rows:
        arr = arr.at[r_].set(onem)
    return arr


def permutation_mappings(cs: ConstraintSystem, n: int) -> np.ndarray:
    """Returns int32[m, n, 2]: (image_col, image_row) for each cell.

    Uses the native C++ union-find (runtime/native.py, built from
    native/layout.cpp) when available — this is keygen's host hot loop at
    millions of cells — with a pure-python fallback."""
    m = len(cs.permutation_columns)
    col_of = {c: i for i, c in enumerate(cs.permutation_columns)}
    copies_arr = np.empty((len(cs.copies), 4), dtype=np.int64)
    for i, ((ca, ra), (cb, rb)) in enumerate(cs.copies):
        assert ra < n and rb < n
        copies_arr[i] = (col_of[ca], ra, col_of[cb], rb)

    from ..runtime.native import permutation_mapping_native

    native = permutation_mapping_native(m, n, copies_arr)
    if native is not None:
        return native

    uf = _UnionFind(m * n)
    for i in range(copies_arr.shape[0]):
        ca, ra, cb, rb = (int(v) for v in copies_arr[i])
        uf.union(ca * n + ra, cb * n + rb)
    groups: dict[int, list[int]] = {}
    for cell in range(m * n):
        groups.setdefault(uf.find(cell), []).append(cell)
    mapping = np.empty((m, n, 2), dtype=np.int32)
    for members in groups.values():
        for i, cell in enumerate(members):
            nxt = members[(i + 1) % len(members)]
            mapping[cell // n, cell % n, 0] = nxt // n
            mapping[cell // n, cell % n, 1] = nxt % n
    return mapping


def keygen(
    params: ParamsKZG,
    cs: ConstraintSystem,
    fixed_values: list[list[int]],
    transcript_kind: str = "blake2b",
) -> ProvingKey:
    k = params.k
    n = 1 << k
    domain = Domain(BN254_FR, k, cs.extended_k(k))
    assert len(fixed_values) == cs.num_fixed

    fixed_lagrange = []
    for col in fixed_values:
        assert len(col) <= n
        vals = list(col) + [0] * (n - len(col))
        fixed_lagrange.append(mont.encode_ints(BN254_FR, vals))
    fixed_coeff = [intt(BN254_FR, f) for f in fixed_lagrange]
    fixed_extended = [domain.coeff_to_extended(f) for f in fixed_coeff]
    fixed_commitments = [params.commit(f) for f in fixed_coeff]

    # permutation sigmas
    m = len(cs.permutation_columns)
    mapping = permutation_mappings(cs, n)
    omega_pows = power_table_for(BN254_FR, domain.omega, n)
    delta_pows = mont.encode_ints(BN254_FR, [pow(DELTA, i, R) for i in range(max(m, 1))])
    sigma_lagrange = []
    for i in range(m):
        rows_img = jnp.asarray(mapping[i, :, 1])
        cols_img = jnp.asarray(mapping[i, :, 0])
        base = jnp.take(omega_pows, rows_img, axis=0)
        dsel = jnp.take(delta_pows, cols_img, axis=0)
        sigma_lagrange.append(mont.mont_mul(BN254_FR, base, dsel))
    sigma_coeff = [intt(BN254_FR, s) for s in sigma_lagrange]
    sigma_extended = [domain.coeff_to_extended(s) for s in sigma_coeff]
    sigma_commitments = [params.commit(s) for s in sigma_coeff]

    # lagrange selectors on the extended coset
    u = cs.usable_rows(n)
    l0 = _one_hot_poly(domain, [0])
    llast = _one_hot_poly(domain, [u])
    lblind = _one_hot_poly(domain, list(range(u + 1, n)))
    l0_ext = domain.coeff_to_extended(intt(BN254_FR, l0))
    llast_ext = domain.coeff_to_extended(intt(BN254_FR, llast))
    lblind_ext = domain.coeff_to_extended(intt(BN254_FR, lblind))

    # Z_H^{-1} on extended coset: (g^n w'^{jn} - 1)^{-1}
    g_n = pow(domain.g_coset, n, R)
    w_ext_n = pow(domain.extended_omega, n, R)
    zh_vals = []
    cur = g_n
    period = domain.extended_n // n  # w_ext^n has order extended_n / n
    for _ in range(period):
        zh_vals.append((cur - 1) % R)
        cur = cur * w_ext_n % R
    zh_inv = [pow(v, -1, R) for v in zh_vals]
    zh_inv_full = (zh_inv * (domain.extended_n // period))[: domain.extended_n]
    zh_inv_ext = mont.encode_ints(BN254_FR, zh_inv_full)

    vk = VerifyingKey(
        k=k,
        cs=cs,
        fixed_commitments=fixed_commitments,
        permutation_commitments=sigma_commitments,
        transcript_kind=transcript_kind,
    )
    return ProvingKey(
        vk=vk,
        domain=domain,
        fixed_values=[list(col) + [0] * (n - len(col)) for col in fixed_values],
        fixed_lagrange=fixed_lagrange,
        fixed_coeff=fixed_coeff,
        fixed_extended=fixed_extended,
        sigma_lagrange=sigma_lagrange,
        sigma_coeff=sigma_coeff,
        sigma_extended=sigma_extended,
        l0_ext=l0_ext,
        llast_ext=llast_ext,
        lblind_ext=lblind_ext,
        zh_inv_ext=zh_inv_ext,
    )
