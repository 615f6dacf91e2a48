"""SHPLONK (BDFG20) multi-open argument for KZG.

Equivalent of halo2's ProverSHPLONK/VerifierSHPLONK (used by the reference
at `circuits/src/sgx_dcap_verifier.rs:814-843` and via snark-verifier-sdk,
SURVEY.md §2.2 D-PROOF2/D-SDK). Two group elements per multiopen (H and W)
regardless of how many polynomials/points are opened.

Protocol (matching halo2's rotation-set structure):
  * queries are grouped by identical point sets ("rotation sets");
  * y combines polynomials within a set, v combines across sets;
  * H = sum_k v^k (Q_k - R_k) / Z_{S_k} is committed; u is squeezed;
  * L(X) = sum_k v^k Z_{T\\S_k}(u) (Q_k(X) - R_k(u)) - Z_T(u) H(X)
    vanishes at u; W = L/(X-u) is committed;
  * verifier reconstructs Cm(L) from the claimed evals and checks
    e(Cm(L) + u W, G2) * e(-W, [tau]G2) == 1.

Polynomial arithmetic runs on device (power-table multiplies + log-depth
suffix-sum division, `poly/ops.py`); scalar bookkeeping and the final
pairing stay on host.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict

import jax
import jax.numpy as jnp

from ..curves.host_curve import BN254_G1
from ..curves.pairing import G2_GEN, pairing_product_is_one
from ..fields import BN254_FR, mont
from ..fields.params import NUM_LIMBS
from ..poly.ops import divide_by_linear_row, poly_eval
from ..transcript import TranscriptReader, TranscriptWriter
from .kzg import ParamsKZG

R = BN254_FR.p


def _enc1(v: int) -> jax.Array:
    return mont.encode_ints(BN254_FR, [v % R])[0]


@dataclasses.dataclass
class ProverQuery:
    name: str  # identity of the polynomial (same name => same poly)
    poly: jax.Array  # coefficient form, Montgomery
    point: int


@dataclasses.dataclass
class VerifierQuery:
    name: str
    commitment: tuple | None  # host affine G1
    point: int
    eval: int


def _lagrange_interpolate(points: list[int], values: list[int]) -> list[int]:
    """Host interpolation -> coefficient list (low-first), len == len(points)."""
    n = len(points)
    coeffs = [0] * n
    for i, (xi, yi) in enumerate(zip(points, values)):
        # basis poly prod_{j!=i} (X - xj) / (xi - xj)
        basis = [1]
        denom = 1
        for j, xj in enumerate(points):
            if j == i:
                continue
            # basis *= (X - xj)
            new = [0] * (len(basis) + 1)
            for d, c in enumerate(basis):
                new[d + 1] = (new[d + 1] + c) % R
                new[d] = (new[d] - c * xj) % R
            basis = new
            denom = denom * (xi - xj) % R
        scale = yi * pow(denom, -1, R) % R
        for d, c in enumerate(basis):
            coeffs[d] = (coeffs[d] + c * scale) % R
    return coeffs


def _eval_host(coeffs: list[int], x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % R
    return acc


def _group_rotation_sets(queries):
    """Group queries: name -> point set; then frozen point set -> names."""
    by_name_points: dict[str, set[int]] = defaultdict(set)
    for q in queries:
        by_name_points[q.name].add(q.point % R)
    sets: dict[frozenset, list[str]] = defaultdict(list)
    for name in by_name_points:  # insertion order = query order (stable)
        sets[frozenset(by_name_points[name])].append(name)
    # deterministic order: by first appearance of the set
    return list(sets.items())


_OPEN_PROGRAMS: dict = {}


def _shplonk_programs(sig: tuple):
    """Two jitted programs for the open (split by the u squeeze barrier),
    cached on the STRUCTURE of the rotation sets — (poly length, per-set
    (#points, #names)) — so one compile serves every proof for a given
    circuit shape. All challenges/points enter as traced (L,) Montgomery
    rows; eagerly each divide_by_linear baked its per-proof point into a
    doubling-table program constant (two fresh XLA compiles per division
    per proof, the dominant multiopen cost)."""
    progs = _OPEN_PROGRAMS.get(sig)
    if progs is not None:
        return progs
    n, set_sigs = sig

    def smul(a_row, b_row):
        return mont.mont_mul(BN254_FR, a_row[None], b_row[None])[0]

    def bc(row):
        return jnp.broadcast_to(row[None, :], (n, NUM_LIMBS))

    def run_h(polys_flat, r_devs, pts_rows, ptsinv_rows, y_row, v_row):
        # H = sum_k v^k * (Q_k - R_k) / Z_{S_k};  Q_k = sum_j y^j f_j
        combs = []
        h_total = None
        v_pow = mont.one_mont(BN254_FR)
        idx = 0
        for si, (n_pts, n_names) in enumerate(set_sigs):
            comb = None
            y_pow = mont.one_mont(BN254_FR)
            for _ in range(n_names):
                term = mont.mont_mul(BN254_FR, polys_flat[idx], bc(y_pow))
                comb = term if comb is None else mont.add(BN254_FR, comb, term)
                y_pow = smul(y_pow, y_row)
                idx += 1
            combs.append(comb)
            numer = comb.at[:n_pts].set(
                mont.sub(BN254_FR, comb[:n_pts], r_devs[si])
            )
            for pj in range(n_pts):
                numer = divide_by_linear_row(
                    BN254_FR, numer, pts_rows[si][pj], ptsinv_rows[si][pj]
                )
            term = mont.mont_mul(BN254_FR, numer, bc(v_pow))
            h_total = term if h_total is None else mont.add(BN254_FR, h_total, term)
            v_pow = smul(v_pow, v_row)
        return h_total, combs

    def run_w(combs, h_total, r_u_rows, scale_rows, z_t_u_row, u_row, uinv_row):
        # L(X) = sum_k v^k Z_{T\S_k}(u) (Q_k(X) - R_k(u)) - Z_T(u) H(X);
        # scale_rows already carry v^k Z_{T\S_k}(u) (host scalar work)
        L = None
        for comb, r_u, sc in zip(combs, r_u_rows, scale_rows):
            comb = comb.at[0].set(mont.sub(BN254_FR, comb[0], r_u))
            term = mont.mont_mul(BN254_FR, comb, bc(sc))
            L = term if L is None else mont.add(BN254_FR, L, term)
        L = mont.sub(BN254_FR, L, mont.mont_mul(BN254_FR, h_total, bc(z_t_u_row)))
        return divide_by_linear_row(BN254_FR, L, u_row, uinv_row)

    progs = (jax.jit(run_h), jax.jit(run_w))
    _OPEN_PROGRAMS[sig] = progs
    return progs


def shplonk_open(params: ParamsKZG, transcript: TranscriptWriter, queries: list[ProverQuery],
                 mesh=None, evals: dict[tuple[str, int], int] | None = None):
    """`evals` (name, point) -> claimed value: pass the prover's round-7
    eval cache to skip re-evaluating every poly; None recomputes (direct
    library callers)."""
    polys = {}
    for q in queries:
        polys[q.name] = q.poly
    if evals is None:
        evals = {}
        for q in queries:
            key = (q.name, q.point % R)
            if key not in evals:
                evals[key] = poly_eval(BN254_FR, q.poly, q.point)

    rot_sets = _group_rotation_sets(queries)
    n = max(polys[name].shape[0] for name in polys)
    for name, p in polys.items():
        if p.shape[0] < n:
            polys[name] = jnp.concatenate(
                [p, jnp.zeros((n - p.shape[0], NUM_LIMBS), jnp.uint32)]
            )

    y = transcript.squeeze_challenge()
    v = transcript.squeeze_challenge()

    set_sigs = tuple((len(ps), len(names)) for ps, names in rot_sets)
    run_h, run_w = _shplonk_programs((n, set_sigs))

    per_set = []  # (points, names, r_comb)
    polys_flat, r_devs, pts_rows, ptsinv_rows = [], [], [], []
    for point_set, names in rot_sets:
        points = sorted(point_set)
        r_comb = [0] * len(points)
        y_pow = 1
        for name in names:
            polys_flat.append(polys[name])
            r = _lagrange_interpolate(points, [evals[(name, pt)] for pt in points])
            r_comb = [(a + y_pow * b) % R for a, b in zip(r_comb, r)]
            y_pow = y_pow * y % R
        per_set.append((points, names, r_comb))
        r_devs.append(mont.encode_ints(BN254_FR, r_comb))
        pts_rows.append([_enc1(pt) for pt in points])
        ptsinv_rows.append([_enc1(pow(pt, -1, R)) for pt in points])

    h_total, combs = run_h(polys_flat, r_devs, pts_rows, ptsinv_rows,
                           _enc1(y), _enc1(v))
    h_commit = params.commit(h_total, mesh=mesh)
    transcript.write_point(h_commit)
    u = transcript.squeeze_challenge()

    # host scalar bookkeeping: Z_T(u), per-set v^k Z_{T\S_k}(u), R_k(u)
    t_points = sorted({pt for s, _, _ in per_set for pt in s})
    z_t_u = 1
    for pt in t_points:
        z_t_u = z_t_u * (u - pt) % R
    scale_rows, r_u_rows = [], []
    vk_pow = 1
    for points, names, r_comb in per_set:
        z_other = 1
        for pt in t_points:
            if pt not in points:
                z_other = z_other * (u - pt) % R
        scale_rows.append(_enc1(vk_pow * z_other % R))
        r_u_rows.append(_enc1(_eval_host(r_comb, u)))
        vk_pow = vk_pow * v % R

    W = run_w(combs, h_total, r_u_rows, scale_rows, _enc1(z_t_u),
              _enc1(u), _enc1(pow(u, -1, R)))
    w_commit = params.commit(W, mesh=mesh)
    transcript.write_point(w_commit)


def shplonk_verify(
    params: ParamsKZG, transcript: TranscriptReader, queries: list[VerifierQuery]
) -> bool:
    curve = BN254_G1
    pq = [
        ProverQuery(name=q.name, poly=None, point=q.point) for q in queries
    ]
    rot_sets = _group_rotation_sets(pq)
    commits = {q.name: q.commitment for q in queries}
    evals = {(q.name, q.point % R): q.eval for q in queries}

    y = transcript.squeeze_challenge()
    v = transcript.squeeze_challenge()
    h_commit = transcript.read_point()
    u = transcript.squeeze_challenge()
    w_commit = transcript.read_point()

    per_set = []
    for point_set, names in rot_sets:
        points = sorted(point_set)
        r_comb = [0] * len(points)
        y_pow = 1
        for name in names:
            r = _lagrange_interpolate(points, [evals[(name, pt)] for pt in points])
            r_comb = [(a + y_pow * b) % R for a, b in zip(r_comb, r)]
            y_pow = y_pow * y % R
        per_set.append((points, names, r_comb))

    t_points = sorted({pt for s, _, _ in per_set for pt in s})
    z_t_u = 1
    for pt in t_points:
        z_t_u = z_t_u * (u - pt) % R

    # Cm(L) = sum_k v^k Z_{T\S_k}(u) (sum_j y^j C_j - R_k(u) G) - Z_T(u) H
    acc = None  # G1 accumulator
    scalar_g = 0  # accumulated -R_k(u) * scale on the generator
    vk_pow = 1
    for points, names, r_comb in per_set:
        z_other = 1
        for pt in t_points:
            if pt not in points:
                z_other = z_other * (u - pt) % R
        scale = vk_pow * z_other % R
        y_pow = 1
        for name in names:
            c = curve.mul(scale * y_pow % R, commits[name])
            acc = curve.add(acc, c)
            y_pow = y_pow * y % R
        scalar_g = (scalar_g + scale * _eval_host(r_comb, u)) % R
        vk_pow = vk_pow * v % R
    acc = curve.add(acc, curve.mul((-scalar_g) % R, curve.g))
    acc = curve.add(acc, curve.mul((-z_t_u) % R, h_commit))

    # e(Cm(L) + u W, G2) * e(-W, [tau]G2) == 1
    lhs = curve.add(acc, curve.mul(u, w_commit))
    return pairing_product_is_one(
        [(lhs, params.srs.g2), (curve.neg_pt(w_commit), params.srs.s_g2)]
    )
