"""Mesh prove of a REAL circuit (VERDICT r03 item 6: the row-sharded
quotient/grand-product paths had only ever run on the 16-row K=4 toy).

Circuit: SHA-256 of a 64-byte message (spread-table chip: 5 lookup
arguments, dozens of advice columns) + secp256r1 bigint muls, compiled at
k=12 (4,096 rows, ~41 advice columns, ~165k cells). Mesh proofs must be
byte-identical to the single-device proof.

Runs in the isolated mesh subprocess (tests/test_zmesh_isolated.py) on the
8-virtual-device CPU mesh.
"""

import pytest

from zkdcap_tpu.chips import CircuitBuilder, Context, FlexGate, RangeChip
from zkdcap_tpu.chips.bigint import BigIntChip
from zkdcap_tpu.chips.sha256 import Sha256Chip
from zkdcap_tpu.commit import ParamsKZG, gen_srs
from zkdcap_tpu.curves.host_curve import SECP256R1
from zkdcap_tpu.fields import BN254_FR, mont
from zkdcap_tpu.parallel import proving_mesh
from zkdcap_tpu.plonk.keygen import keygen
from zkdcap_tpu.plonk.prover import create_proof
from zkdcap_tpu.plonk.verifier import verify_proof
from zkdcap_tpu.transcript import TranscriptWriter

K = 12
SEED = b"mesh-real-circuit"


def _build(msg: bytes) -> Context:
    ctx = Context()
    gate = FlexGate(ctx)
    rc = RangeChip(gate, 11)
    fp = BigIntChip(rc, SECP256R1.p)
    sha = Sha256Chip(gate, rc)
    vals = list(msg)
    cells = []
    for b in vals:
        c = ctx.push(b)
        rc.range_check(c, 8)
        cells.append(c)
    sha.digest_bytes(cells, vals)
    a = fp.load_private(0x1234567890ABCDEF)
    b2 = fp.load_private(0xFEDCBA9876543210)
    fp.mul(fp.mul(a, b2), a)
    return ctx


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import numpy as np

    ctx = _build(bytes(range(64)))
    builder = CircuitBuilder(K, lookup_bits=11)
    comp = builder.compile(ctx)
    assert comp.pinning.num_advice >= 8, "not a real multi-column workload"
    assert len(comp.cs.lookups) >= 2, "not a real lookup workload"
    params = ParamsKZG(srs=gen_srs(K, cache_dir=str(tmp_path_factory.mktemp("srs"))))
    pk = keygen(params, comp.cs, comp.fixed_values)
    n = 1 << K
    R = BN254_FR.p
    advice = [
        mont.encode_ints(BN254_FR, [int(v) % R for v in col] + [0] * (n - len(col)))
        for col in builder.witness_columns(comp, ctx)
    ]
    return params, pk, advice


@pytest.mark.slow
def test_mesh_real_circuit_byte_identical(setup):
    params, pk, advice = setup
    tw = TranscriptWriter("blake2b")
    base = create_proof(params, pk, advice, [], tw, blinding_seed=SEED)
    # one mesh size: every size compiles its own multi-device programs
    # (minutes each on XLA:CPU, uncachable — see mesh.bypass_* notes), and
    # 8 devices exercises the full virtual mesh
    tw = TranscriptWriter("blake2b")
    sharded = create_proof(params, pk, advice, [], tw, blinding_seed=SEED,
                           mesh=proving_mesh(8))
    assert sharded == base, "proof bytes diverge on 8-device mesh"
    assert verify_proof(params, pk.vk, [], base)
    bad = bytearray(base)
    bad[len(bad) // 2] ^= 1
    assert not verify_proof(params, pk.vk, [], bytes(bad))
