"""Dynamic-length SHA-256: one circuit shape, witness-selected length."""

import hashlib

from zkdcap_tpu.chips import CircuitBuilder, Context, FlexGate, RangeChip
from zkdcap_tpu.chips.sha256 import Sha256Chip
from zkdcap_tpu.plonk.mock import MockProver

K = 13
LOOKUP_BITS = 12
MAX_LEN = 100


def build(data: bytes):
    assert len(data) <= MAX_LEN
    ctx = Context()
    g = FlexGate(ctx)
    rc = RangeChip(g, LOOKUP_BITS)
    chip = Sha256Chip(g, rc)
    padded = list(data) + [0] * (MAX_LEN - len(data))
    cells = []
    for b in padded:
        c = ctx.push(b)
        rc.range_check(c, 8)
        cells.append(c)
    len_cell = ctx.push(len(data))
    rc.range_check(len_cell, 8)
    out = chip.digest_bytes_dynamic(cells, padded, len_cell, len(data), MAX_LEN)
    return ctx, out


def test_dynamic_matches_hashlib_and_structure_is_static():
    datasets = [b"", b"abc", bytes(range(55)), bytes(range(56)), bytes(range(64)), bytes(range(100))]
    shapes = set()
    for data in datasets:
        ctx, out = build(data)
        got = bytes(v for _, v in out)
        assert got == hashlib.sha256(data).digest(), f"len={len(data)}"
        shapes.add((len(ctx.cells), tuple(ctx.gate_offsets[:5]), len(ctx.copies),
                    len(ctx.lookup_cells), len(ctx.spread_pairs)))
    assert len(shapes) == 1, "circuit shape must be independent of the length witness"


def test_dynamic_mock_satisfied():
    ctx, _ = build(b"dynamic length works")
    builder = CircuitBuilder(K, lookup_bits=LOOKUP_BITS)
    compiled = builder.compile(ctx)
    advice = builder.witness_columns(compiled, ctx)
    MockProver(K, compiled.cs, compiled.fixed_values, advice, []).assert_satisfied()


def test_dynamic_tamper_fails():
    ctx, out = build(b"hello")
    ctx.cells[out[5][0]] = (ctx.cells[out[5][0]] + 1) % 256
    builder = CircuitBuilder(K, lookup_bits=LOOKUP_BITS)
    compiled = builder.compile(ctx)
    advice = builder.witness_columns(compiled, ctx)
    assert MockProver(K, compiled.cs, compiled.fixed_values, advice, []).verify()
