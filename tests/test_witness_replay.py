"""Compiled witness generation: record-once / replay tests.

The tape recorded from one input must replay bit-identical witnesses for
*different* inputs (vs a fresh Python trace) — this catches any dataflow
the tracer failed to capture (baked branches, untraced hints)."""

import random

from zkdcap_tpu.circuits.p256_ecdsa import (
    ECDSAInput,
    build_ecdsa_trace,
    trace_inputs,
)
from zkdcap_tpu.curves.host_curve import SECP256R1
from zkdcap_tpu.witness.tape import WitnessTape, record

RNG = random.Random(99)


def _sign(msg_int: int, d: int, k: int) -> ECDSAInput:
    c = SECP256R1
    R_pt = c.mul(k, c.g)
    r = R_pt[0] % c.n
    s = pow(k, -1, c.n) * (msg_int + r * d) % c.n
    pub = c.mul(d, c.g)
    return ECDSAInput(r=r, s=s, msghash=msg_int % c.n, x=pub[0], y=pub[1])


def _rand_input() -> ECDSAInput:
    return _sign(
        RNG.randrange(1, SECP256R1.n),
        RNG.randrange(1, SECP256R1.n),
        RNG.randrange(1, SECP256R1.n),
    )


def test_p256_tape_replays_fresh_inputs():
    inp_a = _rand_input()
    ctx_a, tape = record(lambda tr: build_ecdsa_trace(inp_a, tracer=tracer_or(tr)))
    # recorded trace must equal the untraced trace for the same input
    plain_a = build_ecdsa_trace(inp_a)
    assert ctx_a.cells == plain_a.cells
    assert ctx_a.gate_offsets == plain_a.gate_offsets
    assert ctx_a.copies == plain_a.copies
    # tape recorded from A replays B and C correctly
    for _ in range(2):
        inp_b = _rand_input()
        cells_b = tape.replay_py(trace_inputs(inp_b))
        fresh_b = build_ecdsa_trace(inp_b)
        assert cells_b == fresh_b.cells


def tracer_or(tr):
    return tr


def test_native_eval_matches_python_replay():
    import pytest

    from zkdcap_tpu.witness import native

    if native._lib is None:
        pytest.skip("libwitness_eval.so not built")
    inp_a = _rand_input()
    _, tape = record(lambda tr: build_ecdsa_trace(inp_a, tracer=tr))
    for _ in range(2):
        inp_b = _rand_input()
        got = native.eval_tape(tape, trace_inputs(inp_b))
        assert got is not None, "native eval reported an error"
        assert got == tape.replay_py(trace_inputs(inp_b))


def test_dcap_tape_replays():
    from zkdcap_tpu.circuits.dcap import (
        build_dcap_trace,
        load_demo_input,
        trace_inputs as dcap_trace_inputs,
    )

    inp = load_demo_input()
    ctx_t, tape = record(lambda tr: build_dcap_trace(inp, tracer=tr))
    plain = build_dcap_trace(inp)
    assert ctx_t.cells == plain.cells
    assert ctx_t.gate_offsets == plain.gate_offsets
    assert ctx_t.copies == plain.copies
    assert tape.replay_py(dcap_trace_inputs(inp)) == plain.cells
    from zkdcap_tpu.witness import native

    if native._lib is not None:
        assert native.eval_tape(tape, dcap_trace_inputs(inp)) == plain.cells


def test_cert_chain_tape_replays_fresh_inputs():
    """Roadmap cert-chain circuit: tape recorded from one chain replays a
    DIFFERENT chain of the same shape bit-identically (full-proof lifecycle
    support, VERDICT r03 item 4)."""
    from zkdcap_tpu.circuits.cert_chain import (
        build_cert_chain_trace,
        make_demo_chain,
        trace_inputs as chain_trace_inputs,
    )

    # the root pubkey is a structure CONSTANT (fixed-base mul layout depends
    # on it): replayable inputs must share it, so pin root_key across seeds
    chain_a = make_demo_chain(tbs_len=128, seed=3, root_key=0xD00DFEED)
    ctx_t, tape = record(lambda tr: build_cert_chain_trace(chain_a, tracer=tr))
    plain = build_cert_chain_trace(chain_a)
    assert ctx_t.cells == plain.cells
    assert ctx_t.gate_offsets == plain.gate_offsets
    assert ctx_t.copies == plain.copies
    chain_b = make_demo_chain(tbs_len=128, seed=4, root_key=0xD00DFEED)
    fresh_b = build_cert_chain_trace(chain_b)
    assert tape.replay_py(chain_trace_inputs(chain_b)) == fresh_b.cells
    from zkdcap_tpu.witness import native

    if native._lib is not None:
        assert native.eval_tape(tape, chain_trace_inputs(chain_b)) == fresh_b.cells


def test_quote_tape_replays_fresh_inputs():
    """Roadmap full-quote circuit: same record/replay contract. The replay
    input must share the structure constants (measurements), so the fresh
    input reuses them with different keys/reports."""
    import dataclasses
    import hashlib
    import random as _random

    from zkdcap_tpu.circuits.quote import (
        REPORT_DATA_OFF,
        build_quote_trace,
        make_demo_quote,
        trace_inputs as quote_trace_inputs,
    )

    q_a = make_demo_quote(seed=21)
    ctx_t, tape = record(lambda tr: build_quote_trace(q_a, tracer=tr))
    plain = build_quote_trace(q_a)
    assert ctx_t.cells == plain.cells
    assert ctx_t.copies == plain.copies
    # fresh input with the SAME measurement constants: new keys + new qe
    # report_data + re-signed reports
    rng = _random.Random(22)
    c = SECP256R1
    ak_d, pck_d = rng.randrange(1, c.n), rng.randrange(1, c.n)
    ak, pck = c.mul(ak_d, c.g), c.mul(pck_d, c.g)
    qe = bytearray(q_a.qe3_report)
    ak_bytes = ak[0].to_bytes(32, "big") + ak[1].to_bytes(32, "big")
    qe[REPORT_DATA_OFF : REPORT_DATA_OFF + 32] = hashlib.sha256(ak_bytes).digest()

    def sign(data, d):
        z = int.from_bytes(hashlib.sha256(data).digest(), "big") % c.n
        k = rng.randrange(1, c.n)
        r = c.mul(k, c.g)[0] % c.n
        return (r, pow(k, -1, c.n) * (z + r * d) % c.n)

    q_b = dataclasses.replace(
        q_a, qe3_report=bytes(qe), attest_pub=ak, pck_pub=pck,
        isv_sig=sign(q_a.isv_report, ak_d), qe_sig=sign(bytes(qe), pck_d),
    )
    assert q_b.verify_native()
    fresh_b = build_quote_trace(q_b)
    assert tape.replay_py(quote_trace_inputs(q_b)) == fresh_b.cells
    from zkdcap_tpu.witness import native

    if native._lib is not None:
        assert native.eval_tape(tape, quote_trace_inputs(q_b)) == fresh_b.cells


def test_witness_limbs_matches_witness_columns():
    """The vectorized limb fill (tape-replay path) must scatter witness
    cells into exactly the same (column, row) slots as the reference
    witness_columns fill — including lookup-advice and pair-table columns."""
    import numpy as np

    from zkdcap_tpu.chips import CircuitBuilder, Context, FlexGate, RangeChip
    from zkdcap_tpu.chips.base64 import Base64Chip
    from zkdcap_tpu.fields import BN254_FR
    from zkdcap_tpu.witness.tape import cells_u16, record

    R = BN254_FR.p

    def build(tr):
        ctx = Context(tracer=tr)
        gate = FlexGate(ctx)
        rc = RangeChip(gate, 8)
        b64 = Base64Chip(gate, rc)
        v = tr.input(12345) if tr is not None else 12345
        c = ctx.push(v)
        rc.range_check(c, 16)
        b64.decode("aGVsbG8=")
        return ctx

    ctx, tape = record(build)
    builder = CircuitBuilder(10, lookup_bits=8)
    compiled = builder.compile(ctx)
    cols = builder.witness_columns(compiled, ctx)
    limbs = builder.witness_limbs(compiled, ctx, cells_u16(ctx.cells))
    assert limbs.shape[0] == len(cols)
    n = limbs.shape[1]
    for i, col in enumerate(cols):
        exp = cells_u16([int(v) % R for v in col] + [0] * (n - len(col)))
        assert np.array_equal(limbs[i], exp), f"column {i} differs"


def test_tape_serialization_roundtrip(tmp_path):
    inp = _rand_input()
    _, tape = record(lambda tr: build_ecdsa_trace(inp, tracer=tr))
    p = str(tmp_path / "tape.npz")
    tape.save(p)
    tape2 = WitnessTape.load(p)
    inp_b = _rand_input()
    assert tape2.replay_py(trace_inputs(inp_b)) == tape.replay_py(trace_inputs(inp_b))
