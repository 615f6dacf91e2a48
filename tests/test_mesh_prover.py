"""Mesh-sharded prover: byte-identical proofs across device counts.

VERDICT round-1 item 2: `create_proof(mesh=...)` must run the actual
9-round pipeline over the mesh (sharded commitment MSMs, row-sharded
Lagrange/extended arrays) and emit byte-identical proofs to single-chip.
Runs on the 8-virtual-device CPU mesh (tests/conftest.py).
"""

import os
import sys

import pytest

from zkdcap_tpu.commit import ParamsKZG, gen_srs
from zkdcap_tpu.fields import BN254_FR, mont
from zkdcap_tpu.parallel import proving_mesh
from zkdcap_tpu.plonk.keygen import keygen
from zkdcap_tpu.plonk.prover import create_proof
from zkdcap_tpu.plonk.verifier import verify_proof
from zkdcap_tpu.transcript import TranscriptWriter

sys.path.insert(0, os.path.dirname(__file__))

SEED = b"mesh-parity-test"


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from test_plonk_e2e import K, build_cs, witness

    params = ParamsKZG(srs=gen_srs(K, cache_dir=str(tmp_path_factory.mktemp("srs"))))
    cs, _ = build_cs()
    q_vals, t_vals, a_vals, b_vals, c_vals, inst = witness()
    pk = keygen(params, cs, [q_vals, t_vals])
    advice = [mont.encode_ints(BN254_FR, col) for col in (a_vals, b_vals, c_vals)]
    return params, pk, advice, inst


def _prove(params, pk, advice, inst, mesh):
    tw = TranscriptWriter("blake2b")
    return create_proof(params, pk, advice, [inst], tw, blinding_seed=SEED, mesh=mesh)


def test_mesh_proof_bytes_identical(setup):
    params, pk, advice, inst = setup
    base = _prove(params, pk, advice, inst, mesh=None)
    for n_dev in (2, 8):
        mesh = proving_mesh(n_dev)
        sharded = _prove(params, pk, advice, inst, mesh=mesh)
        assert sharded == base, f"proof bytes diverge on {n_dev}-device mesh"
    assert verify_proof(params, pk.vk, [inst], base)


def test_mesh_proof_verifies_and_rejects(setup):
    params, pk, advice, inst = setup
    mesh = proving_mesh(8)
    proof = _prove(params, pk, advice, inst, mesh=mesh)
    assert verify_proof(params, pk.vk, [inst], proof)
    assert not verify_proof(params, pk.vk, [[inst[0] + 1]], proof)
