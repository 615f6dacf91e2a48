"""Randomized interval tests for the bigint chip's STRUCTURAL bounds
(ROADMAP item 9; VERDICT round-1 weak #4): the chip's soundness argument
rests on `limb_bound`/`vmin`/`vmax` propagation — these tests fuzz long
random lazy-op chains and extremal witnesses, asserting after EVERY op:

  * representation invariant: value == sum(limb_vals[i] << 88 i)
  * interval invariants: |limb_vals[i]| <= limb_bound, vmin <= value <= vmax
  * the final circuit satisfies its own constraints (MockProver), i.e. the
    structural completeness asserts inside mul/_carry_chain hold even at
    witness extremes the bounds accounting allows.

The structural bounds are witness-independent, so we drive the SAME op
sequence with both random and adversarially-extreme witness values (0,
p-1, limb patterns 2^88-1) — if the interval arithmetic were too tight,
the extreme run would trip a carry/quotient assert or MockProver failure.
"""

import random

import pytest

from zkdcap_tpu.chips import CircuitBuilder, Context, FlexGate, RangeChip
from zkdcap_tpu.chips.bigint import LIMB_BITS, NUM_LIMBS, BigIntChip, CRTInt
from zkdcap_tpu.curves.host_curve import SECP256R1
from zkdcap_tpu.plonk.mock import MockProver

K = 12
LOOKUP_BITS = 11
P = SECP256R1.p


def make_chip():
    ctx = Context()
    g = FlexGate(ctx)
    rc = RangeChip(g, LOOKUP_BITS)
    return ctx, BigIntChip(rc, P)


def run_mock(ctx):
    builder = CircuitBuilder(K, lookup_bits=LOOKUP_BITS)
    compiled = builder.compile(ctx)
    advice = builder.witness_columns(compiled, ctx)
    mp = MockProver(K, compiled.cs, compiled.fixed_values, advice,
                    builder.instance_values(ctx))
    return mp


def check_invariants(x: CRTInt):
    recomposed = sum(v << (LIMB_BITS * i) for i, v in enumerate(x.limb_vals))
    assert recomposed == x.value, "limb decomposition out of sync with value"
    for v in x.limb_vals:
        assert abs(v) <= x.limb_bound, (
            f"limb value {v} exceeds structural bound {x.limb_bound}"
        )
    assert x.vmin <= x.value <= x.vmax, (
        f"value {x.value} outside structural interval [{x.vmin}, {x.vmax}]"
    )


def _drive(seed: int, initial_values):
    """One random op program over the given starting witnesses. The op
    SEQUENCE depends only on the seed (structural bounds must stay witness
    independent — that is separately asserted by comparing bound traces)."""
    rng = random.Random(seed)
    ctx, chip = make_chip()
    vals = [chip.load_private(v % P) for v in initial_values]
    for x in vals:
        check_invariants(x)
    bound_trace = []
    for _ in range(40):
        op = rng.choice(["add", "sub", "neg", "scale", "mul", "reduce"])
        i = rng.randrange(len(vals))
        j = rng.randrange(len(vals))
        a, b = vals[i], vals[j]
        if op == "add":
            out = chip.add(a, b)
        elif op == "sub":
            out = chip.sub(a, b)
        elif op == "neg":
            out = chip.neg(a)
        elif op == "scale":
            out = chip.scale(a, rng.randrange(1, 1 << 10))
        elif op == "mul":
            out = chip.mul(a, b)
        else:
            out = chip.reduce(a)
        check_invariants(out)
        bound_trace.append((out.limb_bound, out.vmin, out.vmax))
        vals[rng.randrange(len(vals))] = out
    # every value must still reduce + canonicalize cleanly
    for x in vals:
        c = chip.reduce_canonical(x)
        check_invariants(c)
        assert c.value == x.value % P
    return ctx, bound_trace


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_random_chain_interval_invariants(seed):
    rng = random.Random(1000 + seed)
    starts = [rng.randrange(P) for _ in range(4)]
    ctx, _ = _drive(seed, starts)
    run_mock(ctx).assert_satisfied()


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_extremal_witnesses_same_structure(seed):
    """Same op program, extreme witnesses: the structural bounds must (a)
    be identical to the random-witness run (witness independence — this is
    what makes pinning/pk reuse sound) and (b) still admit the extremes
    (completeness at the interval edges)."""
    rng = random.Random(2000 + seed)
    starts_rand = [rng.randrange(P) for _ in range(4)]
    extremes = [0, P - 1, (1 << LIMB_BITS) - 1,
                ((1 << (2 * LIMB_BITS)) - 1)]  # 0, max, limb patterns
    _, trace_rand = _drive(seed, starts_rand)
    ctx_ext, trace_ext = _drive(seed, extremes)
    assert trace_rand == trace_ext, "structural bounds depend on witness!"
    run_mock(ctx_ext).assert_satisfied()


def test_deep_lazy_sub_chain_stays_sound():
    """Pile up the most-negative interval mul_constrain's offsetting must
    absorb: a long chain of subs of (p-1)-valued operands, then a mul."""
    ctx, chip = make_chip()
    acc = chip.load_private(0)
    big = chip.load_private(P - 1)
    for _ in range(12):
        acc = chip.sub(acc, big)
    check_invariants(acc)
    assert acc.value < 0  # genuinely negative lazy value
    out = chip.mul(acc, big)
    check_invariants(out)
    assert out.value == (acc.value % P) * (P - 1) % P
    run_mock(ctx).assert_satisfied()


def test_deep_add_scale_chain_stays_sound():
    """Pile up the largest positive magnitudes: adds + x1023 scales."""
    ctx, chip = make_chip()
    acc = chip.load_private(P - 1)
    for _ in range(3):
        acc = chip.scale(acc, 1023)
        acc = chip.add(acc, acc)
        check_invariants(acc)
    out = chip.mul(acc, acc)
    check_invariants(out)
    assert out.value == pow(acc.value % P, 2, P)
    run_mock(ctx).assert_satisfied()
