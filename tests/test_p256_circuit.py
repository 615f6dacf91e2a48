"""P-256 ECDSA application circuit: structure, instances, mock satisfiability."""

from zkdcap_tpu.chips import CircuitBuilder
from zkdcap_tpu.circuits.p256_ecdsa import ECDSAInput, build_ecdsa_trace
from zkdcap_tpu.plonk.mock import MockProver
from zkdcap_tpu.runtime.prover import SAMPLE_INPUT

# reference test vector (crates/p256-ecdsa/src/base.rs:295-297)
REF_MSGHASH = "9c8adb93585642008f6defe84b014d3db86e65ec158f32c1fe8b78974123c264"
REF_SIG = (
    "89e7242b7a0be99f7c668a8bdbc1fcaf6fa7562dd28538dbab4b059e9d6955c2"
    "c434593d3ccb0e7e5825effb14e251e6e5efb738d6042647ed2e2faac9191718"
)
REF_PUBKEY = (
    "04cd8fdae57e9fcc6638b7e0bdf1cfe6eb4783c29ed13916f10c121c70b7173dd6"
    "1291422f9ef68a1b6a7e9cccbe7cc2c0738f81a996f7e62e9094c1f80bc0d788"
)


def test_reference_vector_native():
    inp = ECDSAInput.from_hex(REF_MSGHASH, REF_SIG, REF_PUBKEY)
    assert inp.verify_native()
    inst = inp.as_instances()
    assert len(inst) == 15
    # limb recomposition round-trips
    for vi, v in enumerate((inp.msghash, inp.r, inp.s, inp.x, inp.y)):
        got = sum(inst[vi * 3 + i] << (88 * i) for i in range(3))
        assert got == v


def test_sample_input_valid():
    assert SAMPLE_INPUT.verify_native()


def test_circuit_mock_with_reference_vector():
    inp = ECDSAInput.from_hex(REF_MSGHASH, REF_SIG, REF_PUBKEY)
    trace = build_ecdsa_trace(inp, lookup_bits=14)
    builder = CircuitBuilder(15, lookup_bits=14)
    compiled = builder.compile(trace)
    advice = builder.witness_columns(compiled, trace)
    inst = builder.instance_values(trace)
    assert inst[0] == inp.as_instances()
    mp = MockProver(15, compiled.cs, compiled.fixed_values, advice, inst)
    mp.assert_satisfied()


def test_structure_is_input_independent():
    t1 = build_ecdsa_trace(SAMPLE_INPUT, lookup_bits=14)
    inp = ECDSAInput.from_hex(REF_MSGHASH, REF_SIG, REF_PUBKEY)
    t2 = build_ecdsa_trace(inp, lookup_bits=14)
    assert len(t1.cells) == len(t2.cells)
    assert t1.gate_offsets == t2.gate_offsets
    assert t1.copies == t2.copies
    assert t1.lookup_cells == t2.lookup_cells
    assert t1.instance_cells == t2.instance_cells
    assert [c for c, _ in t1.constant_cells] == [c for c, _ in t2.constant_cells]
