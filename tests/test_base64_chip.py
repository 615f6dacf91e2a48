"""Base64 chip vs python base64 (oracle) + constraint checks."""

import base64

from zkdcap_tpu.chips import CircuitBuilder, Context, FlexGate, RangeChip
from zkdcap_tpu.chips.base64 import Base64Chip
from zkdcap_tpu.plonk.mock import MockProver

K = 10
LOOKUP_BITS = 8


def run(text, mock=True, tamper=None):
    ctx = Context()
    g = FlexGate(ctx)
    rc = RangeChip(g, LOOKUP_BITS)
    chip = Base64Chip(g, rc)
    out = chip.decode(text)
    assert bytes(v for _, v in out) == base64.b64decode(text)
    if tamper is not None:
        cell, delta = out[tamper][0], 1
        ctx.cells[cell] = (ctx.cells[cell] + delta) % 256
    if mock:
        builder = CircuitBuilder(K, lookup_bits=LOOKUP_BITS)
        compiled = builder.compile(ctx)
        advice = builder.witness_columns(compiled, ctx)
        mp = MockProver(K, compiled.cs, compiled.fixed_values, advice, [])
        return mp
    return None


def test_decode_simple():
    mp = run(base64.b64encode(b"hello world!").decode())
    mp.assert_satisfied()


def test_decode_with_padding():
    mp = run(base64.b64encode(b"hi there").decode())  # one '='? (8 bytes -> no pad)
    mp.assert_satisfied()
    mp = run(base64.b64encode(b"hello").decode())  # '=' pad
    mp.assert_satisfied()
    mp = run(base64.b64encode(b"hell").decode())  # '==' pad
    mp.assert_satisfied()


def test_tampered_byte_fails():
    mp = run(base64.b64encode(b"attack at dawn").decode(), tamper=3)
    assert mp.verify()
