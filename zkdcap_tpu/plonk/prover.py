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
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import metrics
from ..commit.kzg import ParamsKZG
from ..commit.shplonk import ProverQuery, shplonk_open
from ..fields import BN254_FR, mont
from ..fields.params import NUM_LIMBS
from ..ntt import intt, intt_many
from ..poly.ops import batched_sum, power_table_for, power_table_row
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


def _enc1(v: int) -> jax.Array:
    """Host int -> (L,) Montgomery row (challenge argument encoding)."""
    return mont.encode_ints(BN254_FR, [v % R])[0]


def _row_sharder(mesh):
    """Returns a with_sharding_constraint closure over the mesh's 'shard'
    axis (identity when mesh is None or ZKDCAP_SHARD_ROWS=0). Used inside
    the jitted round programs so GSPMD row-shards the (n, L) field arrays
    across chips within ONE compiled program (SURVEY.md §5.7)."""
    import os

    if mesh is None or os.environ.get("ZKDCAP_SHARD_ROWS", "1") == "0":
        return lambda a: a
    from jax.sharding import NamedSharding, PartitionSpec

    # rows split over ALL mesh axes (("shard",) for proving_mesh,
    # ("host", "chip") for multihost_mesh)
    sh = NamedSharding(mesh, PartitionSpec(tuple(mesh.axis_names), None))
    return lambda a: jax.lax.with_sharding_constraint(a, sh)


def _pk_program(pk: ProvingKey, name: str, builder):
    """Per-pk cache of a jitted round program (traced-challenge design:
    one compiled program serves every proof for this pk)."""
    progs = getattr(pk, "_round_programs", None)
    if progs is None:
        progs = {}
        pk._round_programs = progs
    fn = progs.get(name)
    if fn is None:
        fn = builder(pk)
        progs[name] = fn
    return fn


def _lookup_compress_program_for(pk: ProvingKey):
    """Round-2 input/table compression: ONE program for every lookup's
    theta-combined columns (eagerly this is ~#lookups x #pairs x AST-size
    dispatches over (n, L) arrays). Returns Montgomery AND canonical forms
    (the host multiset sort consumes the canonical rows)."""
    cs = pk.cs

    def builder(_pk):
        def run(fixed_lagr, advice_lagr, instance_lagr, theta_r):
            ev = Evaluator(fixed_lagr, advice_lagr, instance_lagr,
                           challenges={"theta": theta_r})
            out = []
            for lk in cs.lookups:
                theta_pow = mont.one_mont(BN254_FR)
                a_comp = None
                s_comp = None
                for e_in, e_tb in zip(lk.inputs, lk.tables):
                    ai = ev.eval(e_in)
                    si = ev.eval(e_tb)
                    tp = jnp.broadcast_to(theta_pow[None, :], ai.shape)
                    a_term = mont.mont_mul(BN254_FR, ai, tp)
                    s_term = mont.mont_mul(BN254_FR, si, tp)
                    a_comp = a_term if a_comp is None else mont.add(BN254_FR, a_comp, a_term)
                    s_comp = s_term if s_comp is None else mont.add(BN254_FR, s_comp, s_term)
                    theta_pow = mont.mont_mul(
                        BN254_FR, theta_pow[None], theta_r[None]
                    )[0]
                out.append((a_comp, s_comp,
                            mont.from_mont(BN254_FR, a_comp),
                            mont.from_mont(BN254_FR, s_comp)))
            return out

        return jax.jit(run)

    return _pk_program(pk, "lookup_compress", builder)


def _lookup_permute_program_for(pk: ProvingKey):
    """Round-2 multiset permute ON DEVICE (SURVEY.md §5.7: no per-proof host
    sort in create_proof; previously 4.2 s of serial numpy per warm DCAP
    prove).

    Reproduces `_permute_lookup_pair_rows` BYTE-FOR-BYTE so proof bytes are
    unchanged: the host version orders rows by numpy-void memcmp over the
    little-endian u16-limb rows, which equals an unsigned lex compare of
    byte-swapped limb pairs — so the device sort keys are
    swap16(limb 2j) ‖ swap16(limb 2j+1) packed into 8 u32 keys. A single
    stable merged sort of [A rows ‖ S rows] then yields, with cumsums and
    fixed-shape scatters (no data-dependent shapes):
      * A' order  = A rows in sorted order (host: argsort(a_ids, stable));
      * first-occurrence A rows matched to the first equal S row (host:
        s_order[group_start]);
      * remaining A rows paired k-th↔k-th with the unused S rows in sorted
        order (host: s_pos[~first] = s_order[sel]).
    Returns (aorder, s_pos, valid) batched over lookups; `valid` is 0 when
    some input value is missing from the table (host raises ValueError)."""
    cs = pk.cs
    n = 1 << pk.k
    u = cs.usable_rows(n)

    def builder(_pk):
        def one(a_std, s_std):
            c = jnp.concatenate([a_std[:u], s_std[:u]], axis=0)  # (2u, L)
            m = 2 * u
            sw = ((c & 0xFF) << 8) | (c >> 8)  # per-u16 byteswap (memcmp order)
            keys = [(sw[:, 2 * j] << 16) | sw[:, 2 * j + 1]
                    for j in range(NUM_LIMBS // 2)]
            payload = jnp.arange(m, dtype=jnp.int32)
            *skeys, pay = jax.lax.sort((*keys, payload),
                                       num_keys=NUM_LIMBS // 2, is_stable=True)
            K8 = jnp.stack(skeys, axis=1)  # (2u, 8) sorted rows
            newgrp = jnp.any(K8 != jnp.roll(K8, 1, axis=0), axis=1).at[0].set(True)
            pos = jnp.arange(m, dtype=jnp.int32)
            start_pos = jax.lax.cummax(jnp.where(newgrp, pos, -1))
            is_a = pay < u
            ia = is_a.astype(jnp.int32)
            ex_a = jnp.cumsum(ia) - ia  # A rows before this row
            a_rank = ex_a - ex_a[start_pos]  # rank among A rows of the group
            # first S row of each group (stable sort puts A before S within
            # a value group, so the tag flips at most once per group)
            prev_a = jnp.roll(is_a, 1).at[0].set(False)
            is_first_s = (~is_a) & (newgrp | prev_a)
            grp_first_s = jnp.full((m,), -1, jnp.int32).at[
                jnp.where(is_first_s, jnp.cumsum(newgrp.astype(jnp.int32)) - 1, m)
            ].set(pos, mode="drop")
            gid = jnp.cumsum(newgrp.astype(jnp.int32)) - 1
            match = grp_first_s[gid]  # first-S position for this row's group
            grp_has_a = is_a[start_pos]
            valid = ~jnp.any(is_a & (match < 0))
            a_first = is_a & (a_rank == 0)
            match_s = pay[jnp.maximum(match, 0)] - u  # original S index
            # unused S rows (fillers), paired k-th<->k-th with non-first A rows
            filler = (~is_a) & ~(is_first_s & grp_has_a)
            needy = is_a & (a_rank > 0)
            fi = filler.astype(jnp.int32)
            ni = needy.astype(jnp.int32)
            filler_rank = jnp.cumsum(fi) - fi
            needy_rank = jnp.cumsum(ni) - ni
            filler_pay = jnp.zeros((m,), jnp.int32).at[
                jnp.where(filler, filler_rank, m)
            ].set(pay - u, mode="drop")
            s_val = jnp.where(a_first, match_s, filler_pay[needy_rank])
            # compact to A'-row order (rank r = ex_a for A rows)
            dest = jnp.where(is_a, ex_a, m)
            aorder = jnp.zeros((u,), jnp.int32).at[dest].set(pay, mode="drop")
            s_pos = jnp.zeros((u,), jnp.int32).at[dest].set(s_val, mode="drop")
            return aorder, s_pos, valid

        return jax.jit(jax.vmap(one))

    return _pk_program(pk, "lookup_permute", builder)


def _lookup_perm_program_for(pk: ProvingKey):
    """Round-2 permute+blind+INTT: device gather by the host-computed sort
    order, blinding rows appended, and the batched INTT of every permuted
    column — one program, one dispatch."""
    cs = pk.cs
    n = 1 << pk.k
    u = cs.usable_rows(n)

    def builder(_pk):
        def run(a_comps, s_comps, aorders, s_poss, a_blinds, s_blinds):
            padz = jnp.zeros((n - u, NUM_LIMBS), jnp.uint32)
            perm_lagr = []
            for a_comp, s_comp, aorder, s_pos, ab, sb in zip(
                a_comps, s_comps, aorders, s_poss, a_blinds, s_blinds
            ):
                a_perm = jnp.concatenate(
                    [jnp.take(a_comp[:u], aorder, axis=0), padz]
                ).at[u:].set(ab)
                s_perm = jnp.concatenate(
                    [jnp.take(s_comp[:u], s_pos, axis=0), padz]
                ).at[u:].set(sb)
                perm_lagr.extend([a_perm, s_perm])
            return perm_lagr, intt_many(BN254_FR, perm_lagr)

        return jax.jit(run)

    return _pk_program(pk, "lookup_perm", builder)


def _perm_z_program_for(pk: ProvingKey, mesh=None):
    """Round-3 permutation grand products: every chunk's ratio products,
    batch inverse, log-depth prefix scan, chunk chaining, blinding, and the
    batched INTT — one compiled program with beta/gamma traced."""
    cs = pk.cs
    n = 1 << pk.k
    u = cs.usable_rows(n)
    domain = pk.domain
    m = len(cs.permutation_columns)
    chunk = cs.permutation_chunk_len
    delta_rows = [
        mont.encode_ints(BN254_FR, [pow(DELTA, i, R)])[0] for i in range(max(m, 1))
    ]

    def builder(_pk):
        shard_rows = _row_sharder(mesh)

        def run(fixed_lagr, advice_lagr, instance_lagr, sigma_lagr,
                beta_r, gamma_r, blinds):
            fixed_lagr = [shard_rows(a) for a in fixed_lagr]
            advice_lagr = [shard_rows(a) for a in advice_lagr]
            instance_lagr = [shard_rows(a) for a in instance_lagr]
            sigma_lagr = [shard_rows(a) for a in sigma_lagr]
            omega_pows = shard_rows(power_table_for(BN254_FR, domain.omega, n))
            gamma_b = jnp.broadcast_to(gamma_r[None], (n, NUM_LIMBS))
            beta_b = jnp.broadcast_to(beta_r[None], (n, NUM_LIMBS))
            col_arrays = {"fixed": fixed_lagr, "advice": advice_lagr,
                          "instance": instance_lagr}
            perm_zs = []
            last_z_end = None
            for zi, c0 in enumerate(range(0, m, chunk)):
                cols = cs.permutation_columns[c0 : c0 + chunk]
                num = None
                den = None
                for off, col in enumerate(cols):
                    i = c0 + off
                    vals = col_arrays[col.kind][col.index]
                    bd = mont.mont_mul(BN254_FR, beta_r[None], delta_rows[i][None])[0]
                    id_term = mont.mont_mul(
                        BN254_FR, omega_pows,
                        jnp.broadcast_to(bd[None], (n, NUM_LIMBS)),
                    )
                    nterm = mont.add(BN254_FR, mont.add(BN254_FR, vals, id_term), gamma_b)
                    sterm = mont.mont_mul(BN254_FR, sigma_lagr[i], beta_b)
                    dterm = mont.add(BN254_FR, mont.add(BN254_FR, vals, sterm), gamma_b)
                    num = nterm if num is None else mont.mont_mul(BN254_FR, num, nterm)
                    den = dterm if den is None else mont.mont_mul(BN254_FR, den, dterm)
                ratios = mont.mont_mul(BN254_FR, num, _batch_inv(den, u))
                onem = mont.one_mont(BN254_FR, (n,))
                mask = (jnp.arange(n) < u)[:, None]
                ratios = jnp.where(mask, ratios, onem)
                z = _prefix_product_exclusive(ratios)
                if last_z_end is not None:
                    start = jnp.broadcast_to(last_z_end, (n, NUM_LIMBS))
                    z = mont.mont_mul(BN254_FR, z, start)
                last_z_end = z[u]
                z = z.at[u + 1 :].set(blinds[zi])
                perm_zs.append(z)
            return perm_zs, intt_many(BN254_FR, perm_zs)

        return jax.jit(run)

    return _pk_program(pk, f"perm_z@{id(mesh)}" if mesh is not None else "perm_z",
                       builder)


def _lookup_z_program_for(pk: ProvingKey, mesh=None):
    """Round-4 lookup grand products (same design as round 3)."""
    cs = pk.cs
    n = 1 << pk.k
    u = cs.usable_rows(n)

    def builder(_pk):
        shard_rows = _row_sharder(mesh)

        def run(a_list, s_list, ap_list, sp_list, beta_r, gamma_r, blinds):
            a_list = [shard_rows(a) for a in a_list]
            s_list = [shard_rows(a) for a in s_list]
            ap_list = [shard_rows(a) for a in ap_list]
            sp_list = [shard_rows(a) for a in sp_list]
            beta_b = jnp.broadcast_to(beta_r[None], (n, NUM_LIMBS))
            gamma_b = jnp.broadcast_to(gamma_r[None], (n, NUM_LIMBS))
            zs = []
            for li, (a, s, ap, sp) in enumerate(zip(a_list, s_list, ap_list, sp_list)):
                num = mont.mont_mul(
                    BN254_FR,
                    mont.add(BN254_FR, a, beta_b),
                    mont.add(BN254_FR, s, gamma_b),
                )
                den = mont.mont_mul(
                    BN254_FR,
                    mont.add(BN254_FR, ap, beta_b),
                    mont.add(BN254_FR, sp, gamma_b),
                )
                ratios = mont.mont_mul(BN254_FR, num, _batch_inv(den, u))
                onem = mont.one_mont(BN254_FR, (n,))
                mask = (jnp.arange(n) < u)[:, None]
                ratios = jnp.where(mask, ratios, onem)
                z = _prefix_product_exclusive(ratios)
                z = z.at[u + 1 :].set(blinds[li])
                zs.append(z)
            return zs, intt_many(BN254_FR, zs)

        return jax.jit(run)

    return _pk_program(pk, f"lookup_z@{id(mesh)}" if mesh is not None else "lookup_z",
                       builder)


def _evals_query_plan(cs: ConstraintSystem, n: int):
    """Static (label, rotation) query set for round 7, grouped by rotation.
    Mirrors (and must stay in lockstep with) the host-side ProverQuery list
    built in create_proof — minus the h query, whose value the verifier
    derives itself. Returns (groups: rot -> [labels], rot_list)."""
    u = cs.usable_rows(n)
    m = len(cs.permutation_columns)
    chunk = cs.permutation_chunk_len
    n_z = -(-m // chunk) if m else 0
    adv_q, fix_q, _ = collect_queries(cs)
    entries: list[tuple[str, int]] = []
    for ci, rot in adv_q:
        entries.append((f"advice{ci}", rot))
    for ci, rot in fix_q:
        entries.append((f"fixed{ci}", rot))
    entries.append(("random", 0))
    for i in range(m):
        entries.append((f"sigma{i}", 0))
    # h's eval is NOT written to the transcript (the verifier derives it),
    # but the multiopen needs it for the R_k interpolations
    entries.append(("h", 0))
    for c in range(n_z):
        entries.append((f"permz{c}", 0))
        entries.append((f"permz{c}", 1))
        if c + 1 < n_z:
            entries.append((f"permz{c}", u))
    for li in range(len(cs.lookups)):
        entries.extend(
            [(f"lkz{li}", 0), (f"lkz{li}", 1),
             (f"lkA{li}", 0), (f"lkA{li}", -1), (f"lkS{li}", 0)]
        )
    seen: set[tuple[str, int]] = set()
    groups: dict[int, list[str]] = {}
    for label, rot in entries:
        if (label, rot) in seen:
            continue
        seen.add((label, rot))
        groups.setdefault(rot, []).append(label)
    return groups, sorted(groups)


def _evals_program_for(pk: ProvingKey):
    """Round-7 evaluations as ONE jitted program: h-piece combination and
    every opening evaluation sum_i c_i (x w^rot)^i, with x traced. Eagerly
    this round rebuilt a doubling power table per distinct point with the
    challenge baked in as a static constant — a fresh XLA compile on EVERY
    proof (the per-proof 'evals' phase cost was dominated by compiles, not
    math). Here (x w^rot)^i = x^i * (w^rot)^i: one traced-base table plus a
    static per-rotation table."""
    cs = pk.cs
    domain = pk.domain
    n = domain.n
    m = len(cs.permutation_columns)
    adv_q, fix_q, _ = collect_queries(cs)
    n_lk = len(cs.lookups)
    chunk = cs.permutation_chunk_len
    n_z = -(-m // chunk) if m else 0
    groups, rot_list = _evals_query_plan(cs, n)

    def builder(_pk):
        def run(fixed_coeff, advice_coeff, sigma_coeff, random_poly,
                perm_z_coeff, lookup_coeffs, h_pieces, x_row):
            arrs = {"random": random_poly}
            for ci, _ in adv_q:
                arrs[f"advice{ci}"] = advice_coeff[ci]
            for ci, _ in fix_q:
                arrs[f"fixed{ci}"] = fixed_coeff[ci]
            for i in range(m):
                arrs[f"sigma{i}"] = sigma_coeff[i]
            for c in range(n_z):
                arrs[f"permz{c}"] = perm_z_coeff[c]
            for li in range(n_lk):
                zc, ap, sp = lookup_coeffs[li]
                arrs[f"lkz{li}"] = zc
                arrs[f"lkA{li}"] = ap
                arrs[f"lkS{li}"] = sp

            xpow = power_table_row(BN254_FR, x_row, n + 1)  # x^0 .. x^n
            xn_row = xpow[n]
            # combined h poly: sum_i x^{n i} h_i
            h_combined = h_pieces[0]
            xni = xn_row
            for piece in h_pieces[1:]:
                h_combined = mont.add(
                    BN254_FR, h_combined,
                    mont.mont_mul(
                        BN254_FR, piece,
                        jnp.broadcast_to(xni[None, :], piece.shape),
                    ),
                )
                xni = mont.mont_mul(BN254_FR, xni[None], xn_row[None])[0]
            arrs["h"] = h_combined

            out = []
            for rot in rot_list:
                pows = xpow[:n]
                if rot:
                    w_rot = (
                        pow(domain.omega, rot, R)
                        if rot > 0
                        else pow(domain.omega_inv, -rot, R)
                    )
                    pows = mont.mont_mul(
                        BN254_FR, pows, power_table_for(BN254_FR, w_rot, n)
                    )
                stacked = jnp.stack([arrs[lb] for lb in groups[rot]], axis=1)
                terms = mont.mont_mul(
                    BN254_FR, stacked,
                    jnp.broadcast_to(pows[:, None, :], stacked.shape),
                )
                out.append(mont.from_mont(BN254_FR, batched_sum(BN254_FR, terms)))
            return h_combined, out

        return jax.jit(run)

    return _pk_program(pk, "evals", builder), groups, rot_list


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
    def _blind_vals(tag: bytes, count: int) -> jax.Array:
        return mont.encode_ints(BN254_FR, _seeded_rand_ints(blinding_seed + tag, count))

    if ck and ck.has("r2"):
        st = ck.load("r2", transcript, ck_fp)
        lookup_data = st["lookup_data"]
    else:
        lookup_data = []
        if cs.lookups:
            comps = _lookup_compress_program_for(pk)(
                list(pk.fixed_lagrange), list(advice_lagrange),
                list(instance_lagrange), _enc1(theta),
            )
            aorders, s_poss, a_blinds, s_blinds = [], [], [], []
            if os.environ.get("ZKDCAP_DEVICE_PERMUTE", "1") != "0":
                # device multiset permute: one batched program, no host sort
                # and no (n, L)-row device->host pulls (VERDICT r03 item 5)
                a_stack = jnp.stack([c[2] for c in comps])
                s_stack = jnp.stack([c[3] for c in comps])
                ao_b, sp_b, valid = _lookup_permute_program_for(pk)(a_stack, s_stack)
                if not bool(np.all(np.asarray(jax.device_get(valid)))):
                    raise ValueError("lookup failure: input value not in table")
                aorders = [ao_b[i] for i in range(len(comps))]
                s_poss = [sp_b[i] for i in range(len(comps))]
            else:
                for a_comp, s_comp, a_std, s_std in comps:
                    a_std_h = np.asarray(jax.device_get(a_std))[:u]
                    s_std_h = np.asarray(jax.device_get(s_std))[:u]
                    aorder, s_pos = _permute_lookup_pair_rows(a_std_h, s_std_h)
                    aorders.append(jnp.asarray(aorder.astype(np.int32)))
                    s_poss.append(jnp.asarray(s_pos.astype(np.int32)))
            for li, (a_comp, s_comp, _a_std, _s_std) in enumerate(comps):
                a_blinds.append(_blind_vals(b"lkA%d" % li, n - u))
                s_blinds.append(_blind_vals(b"lkS%d" % li, n - u))
                lookup_data.append({"a": a_comp, "s": s_comp})
            perm_lagr, perm_coeffs = _lookup_perm_program_for(pk)(
                [ld["a"] for ld in lookup_data], [ld["s"] for ld in lookup_data],
                aorders, s_poss, a_blinds, s_blinds,
            )
            for li, ld in enumerate(lookup_data):
                ld["a_perm"] = perm_lagr[2 * li]
                ld["s_perm"] = perm_lagr[2 * li + 1]
                ld["a_perm_coeff"] = perm_coeffs[2 * li]
                ld["s_perm_coeff"] = perm_coeffs[2 * li + 1]
            for pt in params.commit_many(perm_coeffs, mesh=mesh):
                transcript.write_point(pt)
        if ck:
            ck.save("r2", transcript, ck_fp, lookup_data=lookup_data)
    _abort("r2")

    _phase("lookup permute+commit")
    beta = transcript.squeeze_challenge()
    gamma = transcript.squeeze_challenge()

    # --- round 3: permutation grand products -----------------------------
    m = len(cs.permutation_columns)
    if ck and ck.has("r3"):
        st = ck.load("r3", transcript, ck_fp)
        perm_z_coeff = st["perm_z_coeff"]
        _skip_r3 = True
    else:
        _skip_r3 = False
    chunk = cs.permutation_chunk_len
    if not _skip_r3:
        if m:
            n_chunks = -(-m // chunk)
            blinds = [
                _blind_vals(b"permz%d" % zi, n - u - 1) for zi in range(n_chunks)
            ]
            _, perm_z_coeff = _perm_z_program_for(pk, mesh)(
                list(pk.fixed_lagrange), list(advice_lagrange),
                list(instance_lagrange), list(pk.sigma_lagrange),
                _enc1(beta), _enc1(gamma), blinds,
            )
        else:
            perm_z_coeff = []
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
    if lookup_data and not _skip_r4:
        blinds = [
            _blind_vals(b"lkz%d" % li, n - u - 1) for li in range(len(lookup_data))
        ]
        _, z_coeffs = _lookup_z_program_for(pk, mesh)(
            [ld["a"] for ld in lookup_data], [ld["s"] for ld in lookup_data],
            [ld["a_perm"] for ld in lookup_data],
            [ld["s_perm"] for ld in lookup_data],
            _enc1(beta), _enc1(gamma), blinds,
        )
        for ld, zc in zip(lookup_data, z_coeffs):
            ld["z_coeff"] = zc
            # lagrange forms are no longer needed; free HBM before quotient
            del ld["a"], ld["s"], ld["a_perm"], ld["s_perm"]
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
            pk, advice_coeff, instance_lagrange, lookup_data, perm_z_coeff,
            theta, beta, gamma, y, mesh=mesh,
        )
        for pt in params.commit_many(h_pieces, mesh=mesh):
            transcript.write_point(pt)
        if ck:
            ck.save("r6", transcript, ck_fp, h_pieces=h_pieces)
    _abort("r6")

    _phase("quotient")
    x = transcript.squeeze_challenge()

    # --- round 7: evaluations --------------------------------------------
    queries: list[ProverQuery] = []

    def q(name, poly, point):
        queries.append(ProverQuery(name, poly, point))

    def point_at(rot: int) -> int:
        if rot >= 0:
            return x * pow(omega, rot, R) % R
        return x * pow(domain.omega_inv, -rot, R) % R

    # one jitted program per pk: h combination + every opening evaluation
    ev_fn, ev_groups, ev_rots = _evals_program_for(pk)
    lookup_coeffs = [
        (ld["z_coeff"], ld["a_perm_coeff"], ld["s_perm_coeff"]) for ld in lookup_data
    ]
    h_combined, eval_arrays = ev_fn(
        list(pk.fixed_coeff), list(advice_coeff), list(pk.sigma_coeff),
        random_poly, list(perm_z_coeff), lookup_coeffs, list(h_pieces),
        _enc1(x),
    )
    eval_cache = {}
    for rot, arr in zip(ev_rots, eval_arrays):
        pt = point_at(rot)
        vals = mont.decode_ints(BN254_FR, arr, from_montgomery=False)
        for label, v in zip(ev_groups[rot], vals):
            eval_cache[(label, pt)] = v

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

    # write all evals except h (verifier derives expected h(x))
    seen = set()
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

        gwc_open(params, transcript, queries, mesh=mesh, evals=eval_cache)
    else:
        shplonk_open(params, transcript, queries, mesh=mesh, evals=eval_cache)
    _phase("multiopen")
    if ck:
        ck.clear()  # consumed: a finished proof leaves no resume state
    return transcript.finalize()


def _quotient_program_for(pk: ProvingKey, mesh=None):
    """ONE jitted program for the whole quotient round (SURVEY.md §3.1
    step 6), cached on the pk. Eagerly, the round is hundreds of dispatches
    over (ext_n, L) arrays — each a separate executable launch (and, under
    the axon tunnel, a remote round-trip). Challenges enter as traced (L,)
    Montgomery arrays so the SAME compiled program serves every proof; the
    static constraint structure (gate ASTs, permutation chunks, lookups)
    is baked in at trace time from the ConstraintSystem.

    With `mesh`, every extended-coset array carries a row-sharding
    constraint over the mesh's 'shard' axis, so GSPMD row-shards the
    pointwise constraint evaluation (the quotient's dominant work) across
    chips inside this ONE compiled program — the SURVEY §5.7 "row-dimension
    scaling" path. XLA inserts the gather/reshard collectives around the
    NTTs itself (eagerly dispatching sharded ops proved unreliable on
    XLA:CPU; compiled GSPMD programs are the supported route)."""
    cs = pk.cs
    domain = pk.domain
    n = domain.n
    ext_n = domain.extended_n
    ratio = ext_n // n
    u = cs.usable_rows(n)
    m = len(cs.permutation_columns)
    chunk = cs.permutation_chunk_len
    num_pieces = cs.quotient_pieces()
    # static per-column delta^i (Montgomery (L,) rows, closure constants)
    delta_rows = [
        mont.encode_ints(BN254_FR, [pow(DELTA, i, R)])[0] for i in range(max(m, 1))
    ]
    g_coset_row = mont.encode_ints(BN254_FR, [domain.g_coset])

    def smul(a_row, b_row):  # (L,) x (L,) Montgomery scalar mul
        return mont.mont_mul(BN254_FR, a_row[None], b_row[None])[0]

    def bc(row):  # (L,) -> (ext_n, L)
        return jnp.broadcast_to(row[None, :], (ext_n, NUM_LIMBS))

    shard_rows = _row_sharder(mesh)

    def run(fixed_ext, sigma_ext, l0, llast, lblind, zh_inv_ext,
            advice_coeff, instance_lagrange, perm_z_coeff, lookup_coeffs,
            theta_r, beta_r, gamma_r, y_r):
        fixed_ext = [shard_rows(a) for a in fixed_ext]
        sigma_ext = [shard_rows(a) for a in sigma_ext]
        l0, llast, lblind, zh_inv_ext = (
            shard_rows(l0), shard_rows(llast), shard_rows(lblind),
            shard_rows(zh_inv_ext),
        )
        advice_ext = [shard_rows(domain.coeff_to_extended(a)) for a in advice_coeff]
        instance_ext = [
            shard_rows(domain.coeff_to_extended(intt(BN254_FR, i)))
            for i in instance_lagrange
        ]
        ev = Evaluator(
            fixed_ext,
            advice_ext,
            instance_ext,
            rot_scale=ratio,
            challenges={"theta": theta_r},
        )

        one_ext = mont.one_mont(BN254_FR, (ext_n,))
        active = mont.sub(BN254_FR, one_ext, mont.add(BN254_FR, llast, lblind))

        acc = None
        y_pow = [mont.one_mont(BN254_FR)]  # (L,) Montgomery running y^i

        def add_constraint(vals):
            nonlocal acc
            term = mont.mont_mul(BN254_FR, vals, bc(y_pow[0]))
            acc = term if acc is None else mont.add(BN254_FR, acc, term)
            y_pow[0] = smul(y_pow[0], y_r)

        # gates
        for g in cs.gates:
            for poly in g.polys:
                add_constraint(ev.eval(poly))

        # permutation constraints
        if m:
            zs_ext = [shard_rows(domain.coeff_to_extended(zc)) for zc in perm_z_coeff]
            # l_0 * (1 - z_0)
            add_constraint(
                mont.mont_mul(BN254_FR, l0, mont.sub(BN254_FR, one_ext, zs_ext[0]))
            )
            # l_last * (z_last^2 - z_last)
            zl = zs_ext[-1]
            add_constraint(
                mont.mont_mul(
                    BN254_FR, llast,
                    mont.sub(BN254_FR, mont.mont_mul(BN254_FR, zl, zl), zl),
                )
            )
            # chunk chaining: l_0 * (z_c - z_{c-1}(w^u X))
            for c in range(1, len(zs_ext)):
                prev_rot = jnp.roll(zs_ext[c - 1], -u * ratio, axis=0)
                add_constraint(
                    mont.mont_mul(BN254_FR, l0, mont.sub(BN254_FR, zs_ext[c], prev_rot))
                )
            # main: active * (z(wX) prod(col + beta sigma + gamma)
            #                 - z prod(col + beta delta^i X + gamma))
            col_arrays_ext = {
                "fixed": fixed_ext,
                "advice": advice_ext,
                "instance": instance_ext,
            }
            xs = shard_rows(mont.mont_mul(
                BN254_FR,
                power_table_for(BN254_FR, domain.extended_omega, ext_n),
                jnp.broadcast_to(g_coset_row, (ext_n, NUM_LIMBS)),
            ))
            gamma_e = bc(gamma_r)
            beta_e = bc(beta_r)
            for ci, c0 in enumerate(range(0, m, chunk)):
                cols = cs.permutation_columns[c0 : c0 + chunk]
                z = zs_ext[ci]
                z_next = jnp.roll(z, -ratio, axis=0)
                left = z_next
                right = z
                for off, col in enumerate(cols):
                    i = c0 + off
                    vals = col_arrays_ext[col.kind][col.index]
                    sig = sigma_ext[i]
                    sterm = mont.mont_mul(BN254_FR, sig, beta_e)
                    left = mont.mont_mul(
                        BN254_FR, left,
                        mont.add(BN254_FR, mont.add(BN254_FR, vals, sterm), gamma_e),
                    )
                    idterm = mont.mont_mul(
                        BN254_FR, xs, bc(smul(beta_r, delta_rows[i]))
                    )
                    right = mont.mont_mul(
                        BN254_FR, right,
                        mont.add(BN254_FR, mont.add(BN254_FR, vals, idterm), gamma_e),
                    )
                add_constraint(
                    mont.mont_mul(BN254_FR, active, mont.sub(BN254_FR, left, right))
                )

        # lookup constraints
        if cs.lookups:
            beta_e = bc(beta_r)
            gamma_e = bc(gamma_r)
            for lk, (z_coeff, ap_coeff, sp_coeff) in zip(cs.lookups, lookup_coeffs):
                theta_pow = mont.one_mont(BN254_FR)
                a_comp = None
                s_comp = None
                for e_in, e_tb in zip(lk.inputs, lk.tables):
                    ai = ev.eval(e_in)
                    si = ev.eval(e_tb)
                    tp = bc(theta_pow)
                    a_term = mont.mont_mul(BN254_FR, ai, tp)
                    s_term = mont.mont_mul(BN254_FR, si, tp)
                    a_comp = a_term if a_comp is None else mont.add(BN254_FR, a_comp, a_term)
                    s_comp = s_term if s_comp is None else mont.add(BN254_FR, s_comp, s_term)
                    theta_pow = smul(theta_pow, theta_r)
                z_ext = shard_rows(domain.coeff_to_extended(z_coeff))
                ap_ext = shard_rows(domain.coeff_to_extended(ap_coeff))
                sp_ext = shard_rows(domain.coeff_to_extended(sp_coeff))
                z_next = jnp.roll(z_ext, -ratio, axis=0)
                ap_prev = jnp.roll(ap_ext, ratio, axis=0)
                # l_0 * (1 - z)
                add_constraint(
                    mont.mont_mul(BN254_FR, l0, mont.sub(BN254_FR, one_ext, z_ext))
                )
                # l_last * (z^2 - z)
                add_constraint(
                    mont.mont_mul(
                        BN254_FR, llast,
                        mont.sub(BN254_FR, mont.mont_mul(BN254_FR, z_ext, z_ext), z_ext),
                    )
                )
                # active * (z(wX)(A'+beta)(S'+gamma) - z(X)(A+beta)(S+gamma))
                lhs = mont.mont_mul(
                    BN254_FR, z_next,
                    mont.mont_mul(
                        BN254_FR,
                        mont.add(BN254_FR, ap_ext, beta_e),
                        mont.add(BN254_FR, sp_ext, gamma_e),
                    ),
                )
                rhs = mont.mont_mul(
                    BN254_FR, z_ext,
                    mont.mont_mul(
                        BN254_FR,
                        mont.add(BN254_FR, a_comp, beta_e),
                        mont.add(BN254_FR, s_comp, gamma_e),
                    ),
                )
                add_constraint(
                    mont.mont_mul(BN254_FR, active, mont.sub(BN254_FR, lhs, rhs))
                )
                # l_0 * (A' - S')
                add_constraint(
                    mont.mont_mul(BN254_FR, l0, mont.sub(BN254_FR, ap_ext, sp_ext))
                )
                # active * (A' - S') * (A' - A'(w^-1 X))
                add_constraint(
                    mont.mont_mul(
                        BN254_FR, active,
                        mont.mont_mul(
                            BN254_FR,
                            mont.sub(BN254_FR, ap_ext, sp_ext),
                            mont.sub(BN254_FR, ap_ext, ap_prev),
                        ),
                    )
                )

        # divide by Z_H and split
        h_ext = mont.mont_mul(BN254_FR, acc, zh_inv_ext)
        h_coeff = domain.extended_to_coeff(h_ext)
        return [h_coeff[i * n : (i + 1) * n] for i in range(num_pieces)]

    return jax.jit(run)


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
    mesh=None,
):
    """Evaluate sum_i y^i * constraint_i on the extended coset, divide by Z_H,
    return quotient pieces (coefficient form, n each). Runs as ONE compiled
    program (see _quotient_program_for); with `mesh`, that program row-shards
    the extended arrays across the mesh (opt out: ZKDCAP_SHARD_ROWS=0)."""
    import os

    if mesh is not None and os.environ.get("ZKDCAP_SHARD_ROWS", "1") == "0":
        mesh = None
    key = "quotient" if mesh is None else f"quotient@{id(mesh)}"
    fn = _pk_program(pk, key, lambda _pk: _quotient_program_for(_pk, mesh))
    enc1 = lambda v: mont.encode_ints(BN254_FR, [v % R])[0]
    lookup_coeffs = [
        (ld["z_coeff"], ld["a_perm_coeff"], ld["s_perm_coeff"]) for ld in lookup_data
    ]
    pieces = fn(
        list(pk.fixed_extended), list(pk.sigma_extended), pk.l0_ext, pk.llast_ext,
        pk.lblind_ext, pk.zh_inv_ext, list(advice_coeff), list(instance_lagrange),
        list(perm_z_coeff), lookup_coeffs,
        enc1(theta), enc1(beta), enc1(gamma), enc1(y),
    )
    return pieces, None
