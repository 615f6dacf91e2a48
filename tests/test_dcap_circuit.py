"""DCAP circuit on the reference's real Intel demo witness (SURVEY.md §4).

Mirrors `test_sgx_dcap_verifier_pass` (sgx_dcap_verifier.rs:763-848):
MockProver satisfiability at k=17 on the identical demo inputs.
"""

import pytest

from zkdcap_tpu.chips import CircuitBuilder
from zkdcap_tpu.circuits.dcap import (
    CERT_B64_LEN,
    QE3_REPORT_LEN,
    DcapInput,
    build_dcap_trace,
    load_demo_input,
)
from zkdcap_tpu.plonk.mock import MockProver

K = 17  # ref :765


def test_demo_input_native():
    inp = load_demo_input()
    assert len(inp.cert_b64) == CERT_B64_LEN
    assert len(inp.qe3_report) == QE3_REPORT_LEN
    assert len(inp.decoded_cert()) == 1271
    assert inp.verify_native()


@pytest.mark.slow
def test_dcap_mock_k17():
    inp = load_demo_input()
    trace = build_dcap_trace(inp)
    print(f"dcap cells: {len(trace.cells)}, lookups: {len(trace.lookup_cells)}, "
          f"spread pairs: {len(trace.spread_pairs)}")
    builder = CircuitBuilder(K, lookup_bits=16)
    compiled = builder.compile(trace)
    print(f"advice cols: {compiled.pinning.num_advice}, "
          f"lookup cols: {compiled.pinning.num_lookup_advice}, "
          f"spread cols: {compiled.pinning.num_spread_advice}")
    advice = builder.witness_columns(compiled, trace)
    mp = MockProver(K, compiled.cs, compiled.fixed_values, advice, [])
    mp.assert_satisfied()


@pytest.mark.slow
def test_dcap_rejects_wrong_signature():
    inp = load_demo_input()
    bad = DcapInput(inp.cert_b64, inp.qe3_report, inp.r, (inp.s + 1))
    with pytest.raises(AssertionError):
        build_dcap_trace(bad)
