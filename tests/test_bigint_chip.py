"""CRT bigint chip: constraint-level differential tests vs python ints."""

import random

from zkdcap_tpu.chips import CircuitBuilder, Context, FlexGate, RangeChip
from zkdcap_tpu.chips.bigint import BigIntChip
from zkdcap_tpu.curves.host_curve import SECP256R1
from zkdcap_tpu.plonk.mock import MockProver

RNG = random.Random(5)
K = 11
LOOKUP_BITS = 10
P = SECP256R1.p
N_ORD = SECP256R1.n


def run_mock(ctx):
    builder = CircuitBuilder(K, lookup_bits=LOOKUP_BITS)
    compiled = builder.compile(ctx)
    advice = builder.witness_columns(compiled, ctx)
    mp = MockProver(K, compiled.cs, compiled.fixed_values, advice, builder.instance_values(ctx))
    return mp, compiled


def make_chip():
    ctx = Context()
    g = FlexGate(ctx)
    rc = RangeChip(g, LOOKUP_BITS)
    return ctx, BigIntChip(rc, P)


def test_load_and_ops():
    ctx, chip = make_chip()
    a_v = RNG.randrange(P)
    b_v = RNG.randrange(P)
    a = chip.load_private(a_v)
    b = chip.load_private(b_v)
    c = chip.mul(a, b)
    assert c.value == a_v * b_v % P
    d = chip.add(a, b)
    assert d.value % P == (a_v + b_v) % P
    dr = chip.reduce(d)
    assert dr.value == (a_v + b_v) % P
    e = chip.sub(a, b)
    assert e.value % P == (a_v - b_v) % P
    e2 = chip.mul(e, a)  # lazy (possibly negative) input into mul
    assert e2.value == (a_v - b_v) * a_v % P
    f = chip.neg(a)
    assert f.value % P == (-a_v) % P
    i = chip.inv(a)
    assert i.value == pow(a_v, -1, P)
    i2 = chip.div_strict(b, a)
    assert i2.value == b_v * pow(a_v, -1, P) % P
    z = chip.is_zero(a)
    assert ctx.value(z) == 0
    zero = chip.load_private(0)
    assert ctx.value(chip.is_zero(zero)) == 1
    eq = chip.is_equal(a, a)
    assert ctx.value(eq) == 1
    mp, compiled = run_mock(ctx)
    mp.assert_satisfied()


def test_mul_edges():
    ctx, chip = make_chip()
    cases = [(0, 0), (1, P - 1), (P - 1, P - 1), (P - 1, 1), (2, (P - 1) // 2)]
    for a_v, b_v in cases:
        a = chip.load_private(a_v)
        b = chip.load_private(b_v)
        c = chip.mul(a, b)
        assert c.value == a_v * b_v % P
    mp, _ = run_mock(ctx)
    mp.assert_satisfied()


def test_tampered_mul_fails():
    ctx, chip = make_chip()
    a = chip.load_private(1234567)
    b = chip.load_private(7654321)
    c = chip.mul(a, b)
    # corrupt the low limb of the output
    ctx.cells[c.limbs[0]] = (ctx.cells[c.limbs[0]] + 1) % P
    mp, _ = run_mock(ctx)
    assert mp.verify()


def test_select():
    ctx, chip = make_chip()
    g = chip.gate
    a = chip.load_private(111)
    b = chip.load_private(222)
    one = g.constant(1)
    zero = g.constant(0)
    s1 = chip.select(a, b, one)
    assert s1.value == 111
    s0 = chip.select(a, b, zero)
    assert s0.value == 222
    mp, _ = run_mock(ctx)
    mp.assert_satisfied()
