"""PLONKish prover: the 9-step hot pipeline of SURVEY.md §3.1.

halo2 `create_proof` equivalent (`circuits/src/sgx_dcap_verifier.rs:813-822`):
  1. witness (advice columns) supplied by the circuit layer, blinded here
  2. advice commitments                     — batched NTT + MSM  [device]
  3. lookup permuted commitments           — host multiset sort + MSM
  4. permutation grand products            — device scans + MSM
  5. lookup product commitments            — device scans + MSM
  6. vanishing: random poly + quotient h(X) — extended-coset gate eval [device]
  7. evaluations at x                      — device power-table dots
  8. SHPLONK multiopen                     — device poly ops + 2 MSMs
  9. transcript absorb/squeeze per round   — host (sequential barrier)

Zero-knowledge blinding uses a caller-seeded PRNG — the "deterministic
blinding mode" SURVEY.md §7.4(5) calls for (the reference uses OsRng at
`sgx_dcap_verifier.rs:811`; a pinned seed keeps proofs reproducible for
golden tests).
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from .. import metrics
from ..commit.kzg import ParamsKZG
from ..commit.shplonk import ProverQuery, shplonk_open
from ..fields import BN254_FR, mont
from ..fields.params import NUM_LIMBS
from ..ntt import intt, intt_many
from ..poly.ops import poly_eval_many, power_table_for
from ..transcript import TranscriptWriter
from .cs import ConstraintSystem
from .expression import Challenge, Evaluator, Expression
from .keygen import DELTA, ProvingKey, collect_queries

R = BN254_FR.p


def _seeded_rand_ints(seed: bytes, count: int) -> list[int]:
    out = []
    ctr = 0
    while len(out) < count:
        h = hashlib.blake2b(seed + ctr.to_bytes(8, "little"), digest_size=64).digest()
        out.append(int.from_bytes(h, "little") % R)
        ctr += 1
    return out


def _blind(col: jax.Array, n: int, u: int, seed: bytes, tag: bytes) -> jax.Array:
    """Fill rows u+1..n-1 with seeded random field elements."""
    count = n - (u + 1)
    if count <= 0:
        return col
    vals = mont.encode_ints(BN254_FR, _seeded_rand_ints(seed + tag, count))
    return col.at[u + 1 :].set(vals)


def _batch_inv(x: jax.Array, n_active: int) -> jax.Array:
    """Batch inverse of the first n_active rows (rest replaced by 1 so the
    product trick never meets a zero from blinding-row garbage)."""
    n = x.shape[0]
    mask = (jnp.arange(n) < n_active)[:, None]
    safe = jnp.where(mask, x, mont.one_mont(BN254_FR, (n,)))
    return mont.batch_inv(BN254_FR, safe)


def _prefix_product_exclusive(ratios: jax.Array) -> jax.Array:
    """z_j = prod_{t<j} ratios_t (z_0 = 1), log-depth scan."""
    inc = jax.lax.associative_scan(
        lambda a, b: mont.mont_mul(BN254_FR, a, b), ratios, axis=0
    )
    one = mont.one_mont(BN254_FR, (1,))
    return jnp.concatenate([one, inc[:-1]], axis=0)


def _permute_lookup_pair_rows(a_std: np.ndarray, s_std: np.ndarray):
    """Vectorized halo2 permute_expression_pair on canonical limb rows.

    Returns (a_order, s_positions) — row indices into the original arrays:
    a permuted into a grouping-contiguous order (byte-lexicographic on the
    canonical limbs; ANY order with equal values adjacent satisfies the
    lookup constraint system) with the first occurrence of each distinct
    input value aligned against one table copy. Replaces the per-proof
    python-int multiset sort (decode_ints + list sort measured seconds per
    lookup argument at k>=17)."""
    u = a_std.shape[0]
    rec = np.dtype((np.void, a_std.dtype.itemsize * a_std.shape[1]))
    av = np.ascontiguousarray(a_std).view(rec).ravel()
    sv = np.ascontiguousarray(s_std).view(rec).ravel()
    uniq, inv = np.unique(np.concatenate([av, sv]), return_inverse=True)
    a_ids, s_ids = inv[:u], inv[u:]
    order = np.argsort(a_ids, kind="stable")
    a_sorted = a_ids[order]
    first = np.ones(u, bool)
    first[1:] = a_sorted[1:] != a_sorted[:-1]
    first_ids = a_sorted[first]
    s_counts = np.bincount(s_ids, minlength=len(uniq))
    if (s_counts[first_ids] == 0).any():
        raise ValueError("lookup failure: input value not in table")
    s_order = np.argsort(s_ids, kind="stable")
    group_start = np.searchsorted(s_ids[s_order], first_ids)
    sel = np.ones(u, bool)
    sel[group_start] = False
    s_pos = np.empty(u, np.int64)
    s_pos[first] = s_order[group_start]
    s_pos[~first] = s_order[sel]
    return order, s_pos


def create_proof(
    params: ParamsKZG,
    pk: ProvingKey,
    advice_values: list[jax.Array],
    instances: list[list[int]],
    transcript: TranscriptWriter,
    blinding_seed: bytes | None = None,
    timing: bool = False,
    mesh=None,
    checkpoint_dir: str | None = None,
    multiopen: str = "shplonk",
    _abort_after: str | None = None,
) -> bytes:
    """The 9-round pipeline. `timing=True` prints per-phase wall-clock to
    stderr (ark-std start_timer!/end_timer! analog, SURVEY.md §5.1).

    blinding_seed=None (the default) draws fresh entropy per proof, matching
    the reference's OsRng (`sgx_dcap_verifier.rs:811`) — advice commitments
    are hiding. Pass an explicit seed ONLY in golden/reproducibility tests
    (SURVEY.md §7.4-5 "pinned-RNG parity mode"; ADVICE round-1 fix).

    checkpoint_dir: per-transcript-round checkpointing (SURVEY.md §5.3):
    after each commit round the transcript op log + round arrays persist to
    <dir>/ck_<kind>_rN.npz; a re-invoked create_proof with the same inputs
    resumes after the last completed round and emits a byte-identical
    proof. Checkpoints are removed on success. `_abort_after` is a
    test-only hook simulating preemption after a named round (r1..r6).

    mesh: a jax.sharding.Mesh — the multi-chip prover path (TPU
    replacement for rayon inside halo2's create_proof,
    `sgx_dcap_verifier.rs:813-822`, SURVEY.md §2.3): every commitment
    MSM's points shard across the mesh inside compiled shard_map programs
    (the prover's dominant cost: one MSM per committed column per round).
    Proof bytes are identical to single-chip. Row-sharding the quotient's
    extended arrays through one pjit'ed program is roadmap work — eager
    multi-device dispatch proved unreliable on XLA:CPU (see the mesh-scope
    note below)."""
    import os as _os
    import sys
    import time as _time

    if blinding_seed is None:
        blinding_seed = _os.urandom(32)

    _t = [_time.time()]

    def _phase(name):
        now = _time.time()
        metrics.record(f"prover.{name}", now - _t[0], k=pk.vk.k,
                       mesh=None if mesh is None else str(dict(mesh.shape)))
        if timing:
            print(f"[prover] {name}: {now - _t[0]:.2f}s", file=sys.stderr, flush=True)
        _t[0] = now

    # NOTE on mesh scope: the multi-chip path shards every commitment MSM's
    # points across the mesh INSIDE jax.shard_map (parallel/sharded_msm) —
    # compiled programs whose collectives XLA schedules. The row-domain /
    # extended arrays deliberately stay unsharded: eagerly dispatching jnp
    # ops on sharded arrays compiles an ad-hoc multi-device program per op,
    # and on XLA:CPU the collective-bearing ones (roll/scan/pad) deadlock
    # or abort nondeterministically (observed at the round-3 grand-product
    # scan and the partials fold). Row-sharding the quotient via one
    # pjit'ed program (traced challenges) is ROADMAP work.

    cs = pk.cs
    n = 1 << pk.k
    u = cs.usable_rows(n)
    domain = pk.domain
    omega = domain.omega

    adv_q, fix_q, ins_q = collect_queries(cs)

    # per-transcript-round checkpointing (SURVEY.md §5.3): resumable proofs
    # for preemptible runs; no-op when checkpoint_dir is None
    ck = None
    ck_fp = ""
    if checkpoint_dir is not None:
        from .checkpoint import ProofCheckpoint

        ck_fp = hashlib.blake2b(
            repr((pk.vk.k, transcript.kind, pk.vk.transcript_repr(),
                  [list(c) for c in instances])).encode(),
            digest_size=16,
        ).hexdigest()
        ck = ProofCheckpoint(checkpoint_dir, tag=transcript.kind)

    def _abort(round_name):
        if _abort_after == round_name:
            from .checkpoint import Preempted as _P

            raise _P(f"aborted after {round_name} (test hook)")

    # --- round 0: bind vk + public inputs --------------------------------
    transcript.common_scalar(pk.vk.transcript_repr())
    instances = [list(col) for col in instances]
    assert len(instances) == cs.num_instance
    for col in instances:
        for v in col:
            transcript.common_scalar(v)
    instance_lagrange = [
        mont.encode_ints(BN254_FR, list(col) + [0] * (n - len(col)))
        for col in instances
    ]

    # --- round 1: advice commitments -------------------------------------
    assert len(advice_values) == cs.num_advice
    if ck and ck.has("r1"):
        st = ck.load("r1", transcript, ck_fp)
        blinding_seed = st["seed"]  # later rounds' blinding must match
        advice_lagrange = st["advice_lagrange"]
        advice_coeff = st["advice_coeff"]
    else:
        advice_lagrange = [
            _blind(a, n, u, blinding_seed, b"adv%d" % i)
            for i, a in enumerate(advice_values)
        ]
        advice_coeff = intt_many(BN254_FR, advice_lagrange)
        for pt in params.commit_many(advice_coeff, mesh=mesh):
            transcript.write_point(pt)
        if ck:
            ck.save("r1", transcript, ck_fp, seed=blinding_seed,
                    advice_lagrange=advice_lagrange, advice_coeff=advice_coeff)
    _abort("r1")

    _phase("advice commit")
    theta = transcript.squeeze_challenge()

    # --- round 2: lookup permuted columns --------------------------------
    if ck and ck.has("r2"):
        st = ck.load("r2", transcript, ck_fp)
        lookup_data = st["lookup_data"]
    else:
        ev_row = Evaluator(
            pk.fixed_lagrange, advice_lagrange, instance_lagrange, challenges={"theta": theta}
        )
        lookup_data = []
        for li, lk in enumerate(cs.lookups):
            theta_pow = 1
            a_comp = None
            s_comp = None
            for e_in, e_tb in zip(lk.inputs, lk.tables):
                ai = ev_row.eval(e_in)
                si = ev_row.eval(e_tb)
                tp = mont.encode_ints(BN254_FR, [theta_pow])
                tp_b = jnp.broadcast_to(tp, ai.shape)
                a_term = mont.mont_mul(BN254_FR, ai, tp_b)
                s_term = mont.mont_mul(BN254_FR, si, tp_b)
                a_comp = a_term if a_comp is None else mont.add(BN254_FR, a_comp, a_term)
                s_comp = s_term if s_comp is None else mont.add(BN254_FR, s_comp, s_term)
                theta_pow = theta_pow * theta % R
            a_std = np.asarray(mont.from_mont(BN254_FR, a_comp))[:u]
            s_std = np.asarray(mont.from_mont(BN254_FR, s_comp))[:u]
            aorder, s_pos = _permute_lookup_pair_rows(a_std, s_std)
            a_np = np.asarray(jax.device_get(a_comp))[:u]
            s_np = np.asarray(jax.device_get(s_comp))[:u]
            padz = np.zeros((n - u, NUM_LIMBS), np.uint32)
            a_perm = jnp.asarray(np.concatenate([a_np[aorder], padz]))
            s_perm = jnp.asarray(np.concatenate([s_np[s_pos], padz]))
            a_perm = _blind(a_perm, n, u - 1, blinding_seed, b"lkA%d" % li)
            s_perm = _blind(s_perm, n, u - 1, blinding_seed, b"lkS%d" % li)
            lookup_data.append(
                {"a": a_comp, "s": s_comp, "a_perm": a_perm, "s_perm": s_perm}
            )
        if lookup_data:
            perm_lagr = []
            for ld in lookup_data:
                perm_lagr.extend([ld["a_perm"], ld["s_perm"]])
            perm_coeffs = intt_many(BN254_FR, perm_lagr)
            for li, ld in enumerate(lookup_data):
                ld["a_perm_coeff"] = perm_coeffs[2 * li]
                ld["s_perm_coeff"] = perm_coeffs[2 * li + 1]
            for pt in params.commit_many(perm_coeffs, mesh=mesh):
                transcript.write_point(pt)
        if ck:
            ck.save("r2", transcript, ck_fp, lookup_data=lookup_data)
        del ev_row  # frees cached row-domain evaluations (HBM pressure)
    _abort("r2")

    _phase("lookup permute+commit")
    beta = transcript.squeeze_challenge()
    gamma = transcript.squeeze_challenge()

    # --- round 3: permutation grand products -----------------------------
    m = len(cs.permutation_columns)
    gamma_b = jnp.broadcast_to(mont.encode_ints(BN254_FR, [gamma]), (n, NUM_LIMBS))
    if ck and ck.has("r3"):
        st = ck.load("r3", transcript, ck_fp)
        perm_z_coeff = st["perm_z_coeff"]
        _skip_r3 = True
    else:
        _skip_r3 = False
    chunk = cs.permutation_chunk_len
    omega_pows = power_table_for(BN254_FR, omega, n)
    col_arrays = {"fixed": pk.fixed_lagrange, "advice": advice_lagrange, "instance": instance_lagrange}
    perm_zs = []
    last_z_end = None
    for c0 in [] if _skip_r3 else range(0, m, chunk):
        cols = cs.permutation_columns[c0 : c0 + chunk]
        num = None
        den = None
        for off, col in enumerate(cols):
            i = c0 + off
            vals = col_arrays[col.kind][col.index]
            bd = beta * pow(DELTA, i, R) % R
            id_term = mont.mont_mul(
                BN254_FR, omega_pows, jnp.broadcast_to(mont.encode_ints(BN254_FR, [bd]), (n, NUM_LIMBS))
            )
            nterm = mont.add(BN254_FR, mont.add(BN254_FR, vals, id_term), gamma_b)
            sig = pk.sigma_lagrange[i]
            sterm = mont.mont_mul(
                BN254_FR, sig, jnp.broadcast_to(mont.encode_ints(BN254_FR, [beta]), (n, NUM_LIMBS))
            )
            dterm = mont.add(BN254_FR, mont.add(BN254_FR, vals, sterm), gamma_b)
            num = nterm if num is None else mont.mont_mul(BN254_FR, num, nterm)
            den = dterm if den is None else mont.mont_mul(BN254_FR, den, dterm)
        ratios = mont.mont_mul(BN254_FR, num, _batch_inv(den, u))
        # rows >= u contribute nothing (z defined through row u)
        onem = mont.one_mont(BN254_FR, (n,))
        mask = (jnp.arange(n) < u)[:, None]
        ratios = jnp.where(mask, ratios, onem)
        z = _prefix_product_exclusive(ratios)
        if last_z_end is not None:
            # chain chunks: z_c starts at z_{c-1}(u)
            start = jnp.broadcast_to(last_z_end, (n, NUM_LIMBS))
            z = mont.mont_mul(BN254_FR, z, start)
        last_z_end = z[u]
        z = _blind(z, n, u, blinding_seed, b"permz%d" % (c0 // chunk))
        perm_zs.append(z)
    if not _skip_r3:
        perm_z_coeff = intt_many(BN254_FR, perm_zs)
        for pt in params.commit_many(perm_z_coeff, mesh=mesh):
            transcript.write_point(pt)
        if ck:
            ck.save("r3", transcript, ck_fp, perm_z_coeff=perm_z_coeff)
    _abort("r3")

    _phase("permutation z")
    # --- round 4: lookup grand products ----------------------------------
    if ck and ck.has("r4"):
        st = ck.load("r4", transcript, ck_fp)
        for ld, zc in zip(lookup_data, st["z_coeffs"]):
            ld["z_coeff"] = zc
            for key in ("a", "s", "a_perm", "s_perm"):
                ld.pop(key, None)
        _skip_r4 = True
    else:
        _skip_r4 = False
    beta_b = jnp.broadcast_to(mont.encode_ints(BN254_FR, [beta]), (n, NUM_LIMBS))
    for li, ld in [] if _skip_r4 else list(enumerate(lookup_data)):
        num = mont.mont_mul(
            BN254_FR,
            mont.add(BN254_FR, ld["a"], beta_b),
            mont.add(BN254_FR, ld["s"], gamma_b),
        )
        den = mont.mont_mul(
            BN254_FR,
            mont.add(BN254_FR, ld["a_perm"], beta_b),
            mont.add(BN254_FR, ld["s_perm"], gamma_b),
        )
        ratios = mont.mont_mul(BN254_FR, num, _batch_inv(den, u))
        onem = mont.one_mont(BN254_FR, (n,))
        mask = (jnp.arange(n) < u)[:, None]
        ratios = jnp.where(mask, ratios, onem)
        z = _prefix_product_exclusive(ratios)
        z = _blind(z, n, u, blinding_seed, b"lkz%d" % li)
        ld["z"] = z
    if lookup_data and not _skip_r4:
        z_coeffs = intt_many(BN254_FR, [ld["z"] for ld in lookup_data])
        for ld, zc in zip(lookup_data, z_coeffs):
            ld["z_coeff"] = zc
            # lagrange forms are no longer needed; free HBM before quotient
            del ld["a"], ld["s"], ld["a_perm"], ld["s_perm"], ld["z"]
        for pt in params.commit_many(z_coeffs, mesh=mesh):
            transcript.write_point(pt)
        if ck:
            ck.save("r4", transcript, ck_fp, z_coeffs=z_coeffs)
    elif not _skip_r4 and ck:
        ck.save("r4", transcript, ck_fp, z_coeffs=[])
    _abort("r4")

    _phase("lookup z")
    # --- round 5: vanishing random poly ----------------------------------
    random_poly = mont.encode_ints(
        BN254_FR, _seeded_rand_ints(blinding_seed + b"rand", n)
    )
    if ck and ck.has("r5"):
        ck.load("r5", transcript, ck_fp)  # poly is seed-determined: only
        # the transcript state (the commitment) needs restoring
    else:
        transcript.write_point(params.commit(random_poly, mesh=mesh))
        if ck:
            ck.save("r5", transcript, ck_fp)
    _abort("r5")

    y = transcript.squeeze_challenge()

    # --- round 6: quotient ------------------------------------------------
    if ck and ck.has("r6"):
        st = ck.load("r6", transcript, ck_fp)
        h_pieces = st["h_pieces"]
    else:
        h_pieces, all_constraints_ext = _compute_quotient(
            pk, advice_coeff, instance_lagrange, lookup_data, perm_z_coeff, theta, beta, gamma, y,
        )
        for pt in params.commit_many(h_pieces, mesh=mesh):
            transcript.write_point(pt)
        if ck:
            ck.save("r6", transcript, ck_fp, h_pieces=h_pieces)
    _abort("r6")

    _phase("quotient")
    x = transcript.squeeze_challenge()

    # --- round 7: evaluations --------------------------------------------
    xn = pow(x, n, R)
    queries: list[ProverQuery] = []
    evals_to_write: list[int] = []

    def q(name, poly, point):
        queries.append(ProverQuery(name, poly, point))

    # combined h poly: sum x^{n i} h_i
    h_combined = None
    xni = 1
    for i, piece in enumerate(h_pieces):
        term = mont.mont_mul(
            BN254_FR, piece, jnp.broadcast_to(mont.encode_ints(BN254_FR, [xni]), piece.shape)
        )
        h_combined = term if h_combined is None else mont.add(BN254_FR, h_combined, term)
        xni = xni * xn % R

    def point_at(rot: int) -> int:
        if rot >= 0:
            return x * pow(omega, rot, R) % R
        return x * pow(domain.omega_inv, -rot, R) % R

    # advice evals
    for (ci, rot) in adv_q:
        q(f"advice{ci}", advice_coeff[ci], point_at(rot))
    # fixed evals
    for (ci, rot) in fix_q:
        q(f"fixed{ci}", pk.fixed_coeff[ci], point_at(rot))
    # random poly
    q("random", random_poly, x)
    # sigmas
    for i in range(m):
        q(f"sigma{i}", pk.sigma_coeff[i], x)
    # h combined
    q("h", h_combined, x)
    # permutation zs
    for c, zc in enumerate(perm_z_coeff):
        q(f"permz{c}", zc, x)
        q(f"permz{c}", zc, point_at(1))
        if c + 1 < len(perm_z_coeff):
            q(f"permz{c}", zc, x * pow(omega, u, R) % R)
    # lookups
    for li, ld in enumerate(lookup_data):
        q(f"lkz{li}", ld["z_coeff"], x)
        q(f"lkz{li}", ld["z_coeff"], point_at(1))
        q(f"lkA{li}", ld["a_perm_coeff"], x)
        q(f"lkA{li}", ld["a_perm_coeff"], point_at(-1))
        q(f"lkS{li}", ld["s_perm_coeff"], x)

    # evaluate and write all evals except h (verifier derives expected h(x))
    seen = set()
    eval_cache = {}
    # batch-evaluate grouped by point for device efficiency
    from collections import defaultdict

    by_point: dict[int, list] = defaultdict(list)
    for pq in queries:
        key = (pq.name, pq.point % R)
        by_point[pq.point % R].append((key, pq.poly))
    for pt, items in by_point.items():
        names = []
        polys = []
        dedup = set()
        for key, poly in items:
            if key in dedup:
                continue
            dedup.add(key)
            names.append(key)
            polys.append(poly)
        vals = poly_eval_many(BN254_FR, polys, pt)
        for key, v in zip(names, vals):
            eval_cache[key] = v

    for pq in queries:
        key = (pq.name, pq.point % R)
        if key in seen:
            continue
        seen.add(key)
        if pq.name == "h":
            continue  # verifier computes expected value itself
        transcript.write_scalar(eval_cache[key])

    _phase("evals")
    # --- round 8: multiopen ----------------------------------------------
    if multiopen == "gwc":
        from ..commit.gwc import gwc_open

        gwc_open(params, transcript, queries, mesh=mesh)
    else:
        shplonk_open(params, transcript, queries, mesh=mesh)
    _phase("multiopen")
    if ck:
        ck.clear()  # consumed: a finished proof leaves no resume state
    return transcript.finalize()


def _compute_quotient(
    pk: ProvingKey,
    advice_coeff,
    instance_lagrange,
    lookup_data,
    perm_z_coeff,
    theta: int,
    beta: int,
    gamma: int,
    y: int,
):
    """Evaluate sum_i y^i * constraint_i on the extended coset, divide by Z_H,
    return quotient pieces (coefficient form, n each)."""
    cs = pk.cs
    domain = pk.domain
    n = domain.n
    ext_n = domain.extended_n
    ratio = ext_n // n
    u = cs.usable_rows(n)

    advice_ext = [domain.coeff_to_extended(a) for a in advice_coeff]
    instance_ext = [
        domain.coeff_to_extended(intt(BN254_FR, i)) for i in instance_lagrange
    ]
    ev = Evaluator(
        pk.fixed_extended,
        advice_ext,
        instance_ext,
        rot_scale=ratio,
        challenges={"theta": theta},
    )

    enc = lambda v: jnp.broadcast_to(mont.encode_ints(BN254_FR, [v % R]), (ext_n, NUM_LIMBS))
    one_ext = mont.one_mont(BN254_FR, (ext_n,))
    l0 = pk.l0_ext
    llast = pk.llast_ext
    lblind = pk.lblind_ext
    active = mont.sub(BN254_FR, one_ext, mont.add(BN254_FR, llast, lblind))

    acc = None
    y_pow_holder = [1]

    def add_constraint(vals):
        nonlocal acc
        yp = enc(y_pow_holder[0])
        term = mont.mont_mul(BN254_FR, vals, yp)
        acc = term if acc is None else mont.add(BN254_FR, acc, term)
        y_pow_holder[0] = y_pow_holder[0] * y % R

    # gates
    for g in cs.gates:
        for poly in g.polys:
            add_constraint(ev.eval(poly))

    # permutation constraints
    m = len(cs.permutation_columns)
    if m:
        chunk = cs.permutation_chunk_len
        # extended evals of z polys
        zs_ext = [domain.coeff_to_extended(zc) for zc in perm_z_coeff]
        # l_0 * (1 - z_0)
        add_constraint(
            mont.mont_mul(BN254_FR, l0, mont.sub(BN254_FR, one_ext, zs_ext[0]))
        )
        # l_last * (z_last^2 - z_last)
        zl = zs_ext[-1]
        add_constraint(
            mont.mont_mul(
                BN254_FR, llast, mont.sub(BN254_FR, mont.mont_mul(BN254_FR, zl, zl), zl)
            )
        )
        # chunk chaining: l_0 * (z_c - z_{c-1}(w^u X))
        for c in range(1, len(zs_ext)):
            prev_rot = jnp.roll(zs_ext[c - 1], -u * ratio, axis=0)
            add_constraint(
                mont.mont_mul(BN254_FR, l0, mont.sub(BN254_FR, zs_ext[c], prev_rot))
            )
        # main: active * (z(wX) prod(col + beta sigma + gamma) - z prod(col + beta delta^i X + gamma))
        # identity evals on extended coset: delta^i * (g_coset * w_ext^j)
        coset_pows = None
        col_arrays_ext = {
            "fixed": pk.fixed_extended,
            "advice": advice_ext,
            "instance": instance_ext,
        }
        # X values over extended coset
        xs = mont.mont_mul(
            BN254_FR,
            power_table_for(BN254_FR, domain.extended_omega, ext_n),
            jnp.broadcast_to(mont.encode_ints(BN254_FR, [domain.g_coset]), (ext_n, NUM_LIMBS)),
        )
        gamma_e = enc(gamma)
        for ci, c0 in enumerate(range(0, m, chunk)):
            cols = cs.permutation_columns[c0 : c0 + chunk]
            z = zs_ext[ci]
            z_next = jnp.roll(z, -ratio, axis=0)
            left = z_next
            right = z
            for off, col in enumerate(cols):
                i = c0 + off
                vals = col_arrays_ext[col.kind][col.index]
                sig = pk.sigma_extended[i]
                sterm = mont.mont_mul(BN254_FR, sig, enc(beta))
                left = mont.mont_mul(
                    BN254_FR,
                    left,
                    mont.add(BN254_FR, mont.add(BN254_FR, vals, sterm), gamma_e),
                )
                idterm = mont.mont_mul(BN254_FR, xs, enc(beta * pow(DELTA, i, R) % R))
                right = mont.mont_mul(
                    BN254_FR,
                    right,
                    mont.add(BN254_FR, mont.add(BN254_FR, vals, idterm), gamma_e),
                )
            add_constraint(
                mont.mont_mul(BN254_FR, active, mont.sub(BN254_FR, left, right))
            )

    # lookup constraints
    if lookup_data:
        ev_theta = ev
        beta_e = enc(beta)
        gamma_e = enc(gamma)
        for li, (lk, ld) in enumerate(zip(cs.lookups, lookup_data)):
            theta_pow = 1
            a_comp = None
            s_comp = None
            for e_in, e_tb in zip(lk.inputs, lk.tables):
                ai = ev_theta.eval(e_in)
                si = ev_theta.eval(e_tb)
                tp = enc(theta_pow)
                a_term = mont.mont_mul(BN254_FR, ai, tp)
                s_term = mont.mont_mul(BN254_FR, si, tp)
                a_comp = a_term if a_comp is None else mont.add(BN254_FR, a_comp, a_term)
                s_comp = s_term if s_comp is None else mont.add(BN254_FR, s_comp, s_term)
                theta_pow = theta_pow * theta % R
            z_ext = domain.coeff_to_extended(ld["z_coeff"])
            ap_ext = domain.coeff_to_extended(ld["a_perm_coeff"])
            sp_ext = domain.coeff_to_extended(ld["s_perm_coeff"])
            z_next = jnp.roll(z_ext, -ratio, axis=0)
            ap_prev = jnp.roll(ap_ext, ratio, axis=0)
            # l_0 * (1 - z)
            add_constraint(mont.mont_mul(BN254_FR, l0, mont.sub(BN254_FR, one_ext, z_ext)))
            # l_last * (z^2 - z)
            add_constraint(
                mont.mont_mul(
                    BN254_FR,
                    llast,
                    mont.sub(BN254_FR, mont.mont_mul(BN254_FR, z_ext, z_ext), z_ext),
                )
            )
            # active * (z(wX)(A'+beta)(S'+gamma) - z(X)(A+beta)(S+gamma))
            lhs = mont.mont_mul(
                BN254_FR,
                z_next,
                mont.mont_mul(
                    BN254_FR,
                    mont.add(BN254_FR, ap_ext, beta_e),
                    mont.add(BN254_FR, sp_ext, gamma_e),
                ),
            )
            rhs = mont.mont_mul(
                BN254_FR,
                z_ext,
                mont.mont_mul(
                    BN254_FR,
                    mont.add(BN254_FR, a_comp, beta_e),
                    mont.add(BN254_FR, s_comp, gamma_e),
                ),
            )
            add_constraint(mont.mont_mul(BN254_FR, active, mont.sub(BN254_FR, lhs, rhs)))
            # l_0 * (A' - S')
            add_constraint(
                mont.mont_mul(BN254_FR, l0, mont.sub(BN254_FR, ap_ext, sp_ext))
            )
            # active * (A' - S') * (A' - A'(w^-1 X))
            add_constraint(
                mont.mont_mul(
                    BN254_FR,
                    active,
                    mont.mont_mul(
                        BN254_FR,
                        mont.sub(BN254_FR, ap_ext, sp_ext),
                        mont.sub(BN254_FR, ap_ext, ap_prev),
                    ),
                )
            )

    # divide by Z_H and split
    h_ext = mont.mont_mul(BN254_FR, acc, pk.zh_inv_ext)
    h_coeff = domain.extended_to_coeff(h_ext)
    pieces = []
    num_pieces = cs.quotient_pieces()
    for i in range(num_pieces):
        pieces.append(h_coeff[i * n : (i + 1) * n])
    return pieces, None
