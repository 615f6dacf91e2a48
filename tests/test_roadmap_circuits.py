"""Roadmap circuits: cert-chain (2x ECDSA+SHA) and full-quote verification.

BASELINE.json configs[3] and configs[4] — capabilities the reference
README promises but never implemented (SURVEY.md §0 scope note).
"""

import pytest

from zkdcap_tpu.chips import CircuitBuilder
from zkdcap_tpu.circuits.cert_chain import build_cert_chain_trace, make_demo_chain
from zkdcap_tpu.circuits.quote import build_quote_trace, make_demo_quote
from zkdcap_tpu.plonk.mock import MockProver

K = 17


def test_demo_chain_native():
    chain = make_demo_chain()
    assert chain.verify_native()


def test_demo_quote_native():
    q = make_demo_quote()
    assert q.verify_native()


@pytest.mark.slow
def test_cert_chain_mock():
    chain = make_demo_chain()
    trace = build_cert_chain_trace(chain)
    print(f"cert-chain cells: {len(trace.cells)}")
    builder = CircuitBuilder(K, lookup_bits=16)
    compiled = builder.compile(trace)
    advice = builder.witness_columns(compiled, trace)
    MockProver(K, compiled.cs, compiled.fixed_values, advice, []).assert_satisfied()


@pytest.mark.slow
def test_quote_mock():
    q = make_demo_quote()
    trace = build_quote_trace(q)
    print(f"quote cells: {len(trace.cells)}")
    builder = CircuitBuilder(K, lookup_bits=16)
    compiled = builder.compile(trace)
    advice = builder.witness_columns(compiled, trace)
    MockProver(K, compiled.cs, compiled.fixed_values, advice, []).assert_satisfied()


def test_quote_rejects_bad_mrenclave():
    import dataclasses

    q = make_demo_quote()
    bad = dataclasses.replace(q, mrenclave=bytes(32))
    assert not bad.verify_native()
    with pytest.raises(AssertionError):
        build_quote_trace(bad)
