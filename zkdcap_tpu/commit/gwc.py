"""GWC19 multi-open argument for KZG (halo2 ProverGWC/VerifierGWC).

The alternative to SHPLONK in halo2_proofs' `poly::kzg::multiopen` —
the reference pins SHPLONK (`sgx_dcap_verifier.rs:814-843`) but the
backend crate ships both; this gives the framework the same selectable
pair (`create_proof(..., multiopen="gwc")`).

Protocol:
  * v combines the polynomials queried at the SAME point (powers reset
    per point set, order = first appearance in the query list);
  * one witness commitment per distinct point:
        W_i = Cm( (Q_i(X) - Q_i(z_i)) / (X - z_i) )
  * u (squeezed after all W_i) combines across points; the verifier checks
        e(Σ u^i W_i, [τ]G2) = e(Σ u^i (z_i W_i + C_i - e_i G), G2)
    via one 2-term pairing product.

Proof size: one G1 point per distinct query point (the PLONK pipeline has
3-4) vs SHPLONK's fixed two — the classic trade against prover work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..curves.host_curve import BN254_G1
from ..curves.pairing import pairing_product_is_one
from ..fields import BN254_FR, mont
from ..fields.params import NUM_LIMBS
from ..poly.ops import divide_by_linear_row, poly_eval
from .kzg import ParamsKZG

R = BN254_FR.p


def _enc1(v: int) -> jax.Array:
    return mont.encode_ints(BN254_FR, [v % R])[0]


_GWC_PROGRAMS: dict = {}


def _gwc_program(sig: tuple):
    """One jitted program for every witness quotient, cached on structure
    (poly length, #names per point group); v and the points are traced so
    one compile serves every proof (same rationale as shplonk's programs)."""
    fn = _GWC_PROGRAMS.get(sig)
    if fn is not None:
        return fn
    n, group_sizes = sig

    def bc(row):
        return jnp.broadcast_to(row[None, :], (n, NUM_LIMBS))

    def smul(a_row, b_row):
        return mont.mont_mul(BN254_FR, a_row[None], b_row[None])[0]

    def run(polys_flat, e_rows, pt_rows, ptinv_rows, v_row):
        ws = []
        idx = 0
        for gi, n_names in enumerate(group_sizes):
            comb = None
            v_pow = mont.one_mont(BN254_FR)
            for _ in range(n_names):
                term = mont.mont_mul(BN254_FR, polys_flat[idx], bc(v_pow))
                comb = term if comb is None else mont.add(BN254_FR, comb, term)
                v_pow = smul(v_pow, v_row)
                idx += 1
            comb = comb.at[0].set(mont.sub(BN254_FR, comb[0], e_rows[gi]))
            ws.append(
                divide_by_linear_row(BN254_FR, comb, pt_rows[gi], ptinv_rows[gi])
            )
        return ws

    fn = jax.jit(run)
    _GWC_PROGRAMS[sig] = fn
    return fn


def _group_by_point(queries):
    """point -> names (first-appearance order, deduplicated)."""
    order: list[int] = []
    names: dict[int, list[str]] = {}
    for q in queries:
        pt = q.point % R
        if pt not in names:
            names[pt] = []
            order.append(pt)
        if q.name not in names[pt]:
            names[pt].append(q.name)
    return [(pt, names[pt]) for pt in order]


def gwc_open(params: ParamsKZG, transcript, queries, mesh=None,
             evals: dict[tuple[str, int], int] | None = None):
    """`evals` (name, point) -> claimed value: pass the prover's round-7
    eval cache to skip re-evaluating every poly; None recomputes."""
    polys = {}
    for q in queries:
        polys[q.name] = q.poly
    if evals is None:
        evals = {}
        for q in queries:
            key = (q.name, q.point % R)
            if key not in evals:
                evals[key] = poly_eval(BN254_FR, q.poly, q.point)

    groups = _group_by_point(queries)
    n = max(polys[name].shape[0] for name in polys)
    for name, p in polys.items():
        if p.shape[0] < n:
            polys[name] = jnp.concatenate(
                [p, jnp.zeros((n - p.shape[0], NUM_LIMBS), jnp.uint32)]
            )

    v = transcript.squeeze_challenge()
    run = _gwc_program((n, tuple(len(names) for _, names in groups)))
    polys_flat, e_rows, pt_rows, ptinv_rows = [], [], [], []
    for pt, names in groups:
        e_comb = 0
        v_pow = 1
        for name in names:
            polys_flat.append(polys[name])
            e_comb = (e_comb + v_pow * evals[(name, pt)]) % R
            v_pow = v_pow * v % R
        e_rows.append(_enc1(e_comb))
        pt_rows.append(_enc1(pt))
        ptinv_rows.append(_enc1(pow(pt, -1, R)))
    ws = run(polys_flat, e_rows, pt_rows, ptinv_rows, _enc1(v))
    for w_pt in params.commit_many(ws, mesh=mesh):
        transcript.write_point(w_pt)


def gwc_verify(params: ParamsKZG, transcript, queries) -> bool:
    curve = BN254_G1
    commits = {q.name: q.commitment for q in queries}
    evals = {(q.name, q.point % R): q.eval for q in queries}
    groups = _group_by_point(queries)

    v = transcript.squeeze_challenge()
    w_commits = [transcript.read_point() for _ in groups]
    u = transcript.squeeze_challenge()

    w_multi = None  # Σ u^i W_i
    rhs = None  # Σ u^i (z_i W_i + C_i)
    e_multi = 0  # Σ u^i e_i
    u_pow = 1
    for (pt, names), w in zip(groups, w_commits):
        c_batch = None
        e_batch = 0
        v_pow = 1
        for name in names:
            c_batch = curve.add(c_batch, curve.mul(v_pow, commits[name]))
            e_batch = (e_batch + v_pow * evals[(name, pt)]) % R
            v_pow = v_pow * v % R
        w_multi = curve.add(w_multi, curve.mul(u_pow, w))
        rhs = curve.add(rhs, curve.mul(u_pow * pt % R, w))
        rhs = curve.add(rhs, curve.mul(u_pow, c_batch))
        e_multi = (e_multi + u_pow * e_batch) % R
        u_pow = u_pow * u % R
    rhs = curve.add(rhs, curve.mul((-e_multi) % R, curve.g))

    # e(w_multi, [τ]G2) * e(-rhs, G2) == 1
    return pairing_product_is_one(
        [(w_multi, params.srs.s_g2), (curve.neg_pt(rhs), params.srs.g2)]
    )
