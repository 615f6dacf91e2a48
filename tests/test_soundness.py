"""Adversarial soundness tests at the CONSTRAINT level (VERDICT round-1
item 5): forge witnesses *past* the honest trace builder by mutating
recorded cell values (which become the advice columns directly) and assert
the MockProver's gate/lookup/copy checks reject. An adversarial prover does
not run our trace builder — these tests model exactly that.

Covers all four chip families: CRT bigint, ECDSA (via the ecc gadget),
SHA-256, and base64 — plus randomized single-cell mutation sweeps (every
advice cell must be pinned by SOME constraint; an accepted mutation is an
unconstrained-cell soundness hole) and the structured q/out forgery the
bigint bounds accounting must catch (ROADMAP round-1 item 11).
"""

import random

import pytest

from zkdcap_tpu.chips import CircuitBuilder, Context, FlexGate, RangeChip
from zkdcap_tpu.chips.bigint import LIMB_BITS, BigIntChip, _split
from zkdcap_tpu.curves.host_curve import SECP256R1
from zkdcap_tpu.fields import BN254_FR
from zkdcap_tpu.plonk.mock import MockProver

R = BN254_FR.p
C = SECP256R1
RNG = random.Random(1337)


def mock_of(ctx, k, lookup_bits):
    builder = CircuitBuilder(k, lookup_bits=lookup_bits)
    compiled = builder.compile(ctx)
    advice = builder.witness_columns(compiled, ctx)
    return MockProver(k, compiled.cs, compiled.fixed_values, advice,
                      builder.instance_values(ctx))


def assert_rejected(ctx, cell, delta, k, lookup_bits, what):
    """Coherent forgery: mutate the recorded cell (all copies of it in the
    layout get the forged value) and require a constraint failure."""
    orig = ctx.cells[cell]
    ctx.cells[cell] = (orig + delta) % R
    try:
        fails = mock_of(ctx, k, lookup_bits).verify()
        assert fails, f"forged {what} (cell {cell}, delta {delta}) was ACCEPTED"
    finally:
        ctx.cells[cell] = orig


# ---------------------------------------------------------------------------
# CRT bigint chip
# ---------------------------------------------------------------------------

K_BI = 11
LB_BI = 10


def _bigint_ctx():
    ctx = Context()
    g = FlexGate(ctx)
    rc = RangeChip(g, LB_BI)
    chip = BigIntChip(rc, C.p)
    a = chip.load_private(RNG.randrange(C.p))
    b = chip.load_private(RNG.randrange(C.p))
    c = chip.mul(a, b)
    d = chip.div_strict(c, b)
    e = chip.reduce_canonical(chip.sub(d, a))  # == 0 canonically
    chip.assert_zero(e)
    return ctx, chip, a, b, c


def test_bigint_random_cell_sweep():
    """Every advice cell must be constrained: mutate a random sample of the
    tape one cell at a time; all mutations must be caught."""
    ctx, *_ = _bigint_ctx()
    ncells = len(ctx.cells)
    sample = RNG.sample(range(ncells), 25)
    for cell in sample:
        delta = RNG.choice([1, -1, RNG.randrange(1, R)])
        assert_rejected(ctx, cell, delta, K_BI, LB_BI, f"random cell {cell}")


def test_bigint_forged_output_limb():
    ctx, chip, a, b, c = _bigint_ctx()
    for i in range(3):
        assert_rejected(ctx, c.limbs[i], 1, K_BI, LB_BI, f"mul output limb {i}")


def test_bigint_forged_native_residue():
    ctx, chip, a, b, c = _bigint_ctx()
    assert_rejected(ctx, c.native, 1, K_BI, LB_BI, "mul output native residue")


def test_bigint_coordinated_q_out_forgery():
    """The classic wraparound forgery: out' = out + p, q' = q - 1 satisfies
    a*b = q'p + out' over the integers — the range checks on out's limbs
    are what must reject it. Forge the full coherent set of cells."""
    ctx = Context()
    g = FlexGate(ctx)
    rc = RangeChip(g, LB_BI)
    chip = BigIntChip(rc, C.p)
    a = chip.load_private(RNG.randrange(C.p))
    b = chip.load_private(RNG.randrange(C.p))
    c = chip.mul(a, b)

    forged_out = c.value + chip.p  # still < 2^257, top limb now over budget
    forged_limbs = [
        (forged_out >> (LIMB_BITS * i)) & ((1 << LIMB_BITS) - 1) for i in range(3)
    ]
    originals = [(cell, ctx.cells[cell]) for cell in c.limbs + [c.native]]
    for cell, v in zip(c.limbs, forged_limbs):
        ctx.cells[cell] = v
    ctx.cells[c.native] = forged_out % R
    # NOTE: we do NOT adjust q — the carry identity a*b - q*p - out' is now
    # off by exactly p, so either the carry chain, the native gate, or the
    # top-limb range check must fire. A fully coordinated attacker would
    # also patch q and every carry; the top-limb range lookup (top_bits
    # wide) is then the only thing standing — tested separately below.
    fails = mock_of(ctx, K_BI, LB_BI).verify()
    for cell, v in originals:
        ctx.cells[cell] = v
    assert fails, "out+p forgery accepted"


def test_bigint_fully_coordinated_wraparound_rejected_by_range():
    """Patch out' = out + p AND q' = q - 1 AND every downstream gate cell
    (recompute the whole remaining tape honestly for the forged values) by
    rebuilding the trace with a malicious chip whose mul output is out + p.
    The only surviving defence must be the top-limb range lookup."""
    ctx = Context()
    g = FlexGate(ctx)
    rc = RangeChip(g, LB_BI)
    chip = BigIntChip(rc, C.p)
    a_v = RNG.randrange(C.p)
    b_v = RNG.randrange(C.p)
    a = chip.load_private(a_v)
    b = chip.load_private(b_v)
    # malicious prover: range-checked load of out+p (top limb exceeds the
    # declared top_bits budget) then the standard constrain call with the
    # adjusted quotient baked in by mul_constrain's witness math
    out_forged = a_v * b_v % chip.p + chip.p
    # build the forged CRTInt by hand (cells pushed raw). The honest
    # range_check refuses out-of-range witnesses at trace-build time, so we
    # play the adversarial prover: a hand-rolled decomposition whose
    # RECOMPOSITION GATE HOLDS but whose top chunk exceeds the lookup table
    # — the only constraint left standing is the range lookup itself.
    from zkdcap_tpu.chips.bigint import CRTInt, LIMB_MASK

    def adversarial_range_check(cell, bits, value):
        lb = rc.lookup_bits
        k = (bits + lb - 1) // lb
        limbs = []
        v = value
        for i in range(k - 1):
            limbs.append(ctx.push(v & ((1 << lb) - 1)))
            v >>= lb
        limbs.append(ctx.push(v))  # oversized top chunk (not in the table)
        for l in limbs:
            ctx.lookup_cells.append(l)
        rem = bits - (k - 1) * lb
        if rem < lb:
            ctx.lookup_cells.append(g.mul_const(limbs[-1], 1 << (lb - rem)))
        acc = g.inner_product_const(limbs, [1 << (lb * i) for i in range(k)])
        g.assert_equal(acc, cell)

    limbs_v = _split(out_forged)
    cells = [ctx.push(v) for v in limbs_v]
    chip.rc.range_check(cells[0], LIMB_BITS)
    chip.rc.range_check(cells[1], LIMB_BITS)
    top_val = out_forged >> (2 * LIMB_BITS)
    assert top_val >= 1 << chip.top_bits  # the forgery really is oversized
    adversarial_range_check(cells[2], chip.top_bits, top_val)
    native = chip._native_of(cells)
    out = CRTInt(cells, native, out_forged, limbs_v, LIMB_MASK, 0, chip.load_max)
    chip.mul_constrain(a, b, out)  # quotient consistent with forged out
    fails = mock_of(ctx, K_BI, LB_BI).verify(max_failures=100)
    assert any(f.kind == "lookup" for f in fails), (
        f"coordinated wraparound must die on the top-limb range lookup, got {fails}"
    )


def test_bigint_forged_carry_cell():
    """Tamper a carry-chain cell (pushed during mul_constrain)."""
    ctx = Context()
    g = FlexGate(ctx)
    rc = RangeChip(g, LB_BI)
    chip = BigIntChip(rc, C.p)
    a = chip.load_private(12345678901234567890)
    b = chip.load_private(98765432109876543210)
    n_before = len(ctx.cells)
    c = chip.mul(a, b)
    # carry cells are pushed inside _carry_chain after the q limbs; sweep
    # every cell created by the mul and require each to be constrained
    for cell in range(n_before, len(ctx.cells), 7):
        assert_rejected(ctx, cell, 3, K_BI, LB_BI, f"mul-internal cell {cell}")


# ---------------------------------------------------------------------------
# ECDSA (ecc gadget)
# ---------------------------------------------------------------------------


def _ecdsa_ctx():
    from zkdcap_tpu.chips.ecc import EccChip
    from zkdcap_tpu.chips.ecdsa import ecdsa_verify_no_pubkey_check

    d = RNG.randrange(1, C.n)
    pub = C.mul(d, C.g)
    z = RNG.randrange(C.n)
    kk = RNG.randrange(1, C.n)
    r = C.mul(kk, C.g)[0] % C.n
    s = pow(kk, -1, C.n) * (z + r * d) % C.n

    ctx = Context()
    g = FlexGate(ctx)
    rc = RangeChip(g, 14)
    fq = BigIntChip(rc, C.n)
    fp = BigIntChip(rc, C.p)
    ecc = EccChip(fp, C)
    pk = ecc.load_private(pub)
    r_w = fq.load_private(r)
    s_w = fq.load_private(s)
    z_w = fq.load_private(z)
    res = ecdsa_verify_no_pubkey_check(ecc, fq, pk, r_w, s_w, z_w)
    g.assert_const(res, 1)
    return ctx, r_w, s_w, res


K_EC = 15
LB_EC = 14


@pytest.mark.slow
def test_ecdsa_forged_witness_rejected():
    ctx, r_w, s_w, res = _ecdsa_ctx()
    # swap-r attack: change an r limb coherently; everything downstream was
    # computed for the original r, so gates must fire
    assert_rejected(ctx, r_w.limbs[0], 1, K_EC, LB_EC, "ECDSA r limb")
    assert_rejected(ctx, s_w.limbs[1], -1, K_EC, LB_EC, "ECDSA s limb")
    # res is copied to the constant 1; forging it to 2 must be caught
    assert_rejected(ctx, res, 1, K_EC, LB_EC, "ECDSA result bit")
    # random internal cells
    for cell in RNG.sample(range(len(ctx.cells)), 3):
        assert_rejected(ctx, cell, RNG.randrange(1, R), K_EC, LB_EC,
                        f"ECDSA random cell {cell}")


# ---------------------------------------------------------------------------
# SHA-256 chip
# ---------------------------------------------------------------------------

K_SHA = 13
LB_SHA = 12


def _sha_ctx():
    from zkdcap_tpu.chips.sha256 import Sha256Chip

    ctx = Context()
    g = FlexGate(ctx)
    rc = RangeChip(g, LB_SHA)
    chip = Sha256Chip(g, rc)
    msg = bytes(range(56))
    cells = []
    for byte in msg:
        c = ctx.push(byte)
        rc.range_check(c, 8)
        cells.append(c)
    out = chip.digest_bytes(cells, list(msg))
    return ctx, [c for c, _ in out]


@pytest.mark.slow
def test_sha256_forged_output_byte():
    ctx, out_cells = _sha_ctx()
    assert_rejected(ctx, out_cells[0], 1, K_SHA, LB_SHA, "SHA output byte 0")
    assert_rejected(ctx, out_cells[31], R - 2, K_SHA, LB_SHA, "SHA output byte 31")


@pytest.mark.slow
def test_sha256_random_cell_sweep():
    ctx, _ = _sha_ctx()
    sample = RNG.sample(range(len(ctx.cells)), 10)
    for cell in sample:
        assert_rejected(ctx, cell, RNG.choice([1, R - 1, 1 << 16]), K_SHA, LB_SHA,
                        f"SHA random cell {cell}")


# ---------------------------------------------------------------------------
# base64 chip
# ---------------------------------------------------------------------------

K_B64 = 10
LB_B64 = 8


def _b64_ctx():
    from zkdcap_tpu.chips.base64 import Base64Chip

    ctx = Context()
    g = FlexGate(ctx)
    rc = RangeChip(g, LB_B64)
    chip = Base64Chip(g, rc)
    enc = "TWFueSBoYW5kcyBtYWtlIGxpZ2h0IHdvcmsu"  # "Many hands ..."
    out = chip.decode(enc)
    return ctx, [c for c, _ in out]


def test_base64_forged_decoded_byte():
    ctx, dec_cells = _b64_ctx()
    assert_rejected(ctx, dec_cells[0], 1, K_B64, LB_B64, "b64 decoded byte 0")
    assert_rejected(ctx, dec_cells[-1], 7, K_B64, LB_B64, "b64 decoded byte last")


def test_base64_random_cell_sweep():
    ctx, _ = _b64_ctx()
    sample = RNG.sample(range(len(ctx.cells)), 10)
    for cell in sample:
        assert_rejected(ctx, cell, RNG.choice([1, 63, R - 1]), K_B64, LB_B64,
                        f"b64 random cell {cell}")
