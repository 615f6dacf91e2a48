"""SHA-256 chip vs hashlib (differential oracle, SURVEY.md §4)."""

import hashlib

import pytest

from zkdcap_tpu.chips import CircuitBuilder, Context, FlexGate, RangeChip
from zkdcap_tpu.chips.sha256 import Sha256Chip, spread_int
from zkdcap_tpu.plonk.mock import MockProver

K = 13
LOOKUP_BITS = 12


def test_spread_int():
    assert spread_int(0b101) == 0b10001
    assert spread_int(0) == 0
    assert spread_int(0b11) == 0b101


def run_digest(data: bytes, mock: bool = True):
    ctx = Context()
    g = FlexGate(ctx)
    rc = RangeChip(g, LOOKUP_BITS)
    chip = Sha256Chip(g, rc)
    cells = []
    for b in data:
        c = ctx.push(b)
        rc.range_check(c, 8)
        cells.append(c)
    out = chip.digest_bytes(cells, list(data))
    got = bytes(v for _, v in out)
    assert got == hashlib.sha256(data).digest(), "witness digest mismatch"
    if mock:
        builder = CircuitBuilder(K, lookup_bits=LOOKUP_BITS)
        compiled = builder.compile(ctx)
        advice = builder.witness_columns(compiled, ctx)
        mp = MockProver(K, compiled.cs, compiled.fixed_values, advice, [])
        mp.assert_satisfied()
    return ctx


def test_digest_short():
    run_digest(b"abc")


def test_digest_one_block_exact():
    run_digest(bytes(range(64)))


def test_digest_multiblock_witness_only():
    # 200 bytes -> 4 blocks; witness-level check only (mock above covers constraints)
    run_digest(bytes((i * 7 + 3) % 256 for i in range(200)), mock=False)


def test_tampered_digest_fails():
    data = b"abc"
    ctx = Context()
    g = FlexGate(ctx)
    rc = RangeChip(g, LOOKUP_BITS)
    chip = Sha256Chip(g, rc)
    cells = []
    for b in data:
        c = ctx.push(b)
        rc.range_check(c, 8)
        cells.append(c)
    out = chip.digest_bytes(cells, list(data))
    # corrupt one digest byte cell value
    ctx.cells[out[0][0]] = (ctx.cells[out[0][0]] + 1) % 256
    builder = CircuitBuilder(K, lookup_bits=LOOKUP_BITS)
    compiled = builder.compile(ctx)
    advice = builder.witness_columns(compiled, ctx)
    mp = MockProver(K, compiled.cs, compiled.fixed_values, advice, [])
    assert mp.verify()
