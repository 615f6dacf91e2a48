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

from ..curves.host_curve import BN254_G1
from ..curves.pairing import pairing_product_is_one
from ..fields import BN254_FR, mont
from ..poly.ops import divide_by_linear, poly_add, poly_eval, poly_scale
from .kzg import ParamsKZG

R = BN254_FR.p


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


def gwc_open(params: ParamsKZG, transcript, queries, mesh=None):
    polys = {}
    evals: dict[tuple[str, int], int] = {}
    for q in queries:
        polys[q.name] = q.poly
        key = (q.name, q.point % R)
        if key not in evals:
            evals[key] = poly_eval(BN254_FR, q.poly, q.point)

    v = transcript.squeeze_challenge()
    for pt, names in _group_by_point(queries):
        comb = None
        e_comb = 0
        v_pow = 1
        for name in names:
            term = poly_scale(BN254_FR, polys[name], v_pow)
            comb = term if comb is None else poly_add(BN254_FR, comb, term)
            e_comb = (e_comb + v_pow * evals[(name, pt)]) % R
            v_pow = v_pow * v % R
        const = mont.encode_ints(BN254_FR, [e_comb])[0]
        comb = comb.at[0].set(mont.sub(BN254_FR, comb[0], const))
        w = divide_by_linear(BN254_FR, comb, pt)
        transcript.write_point(params.commit(w, mesh=mesh))


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
