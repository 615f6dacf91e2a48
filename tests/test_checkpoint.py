"""Per-transcript-round proof checkpoint/resume (SURVEY.md §5.3).

Simulates preemption after each commit round via create_proof's test hook,
then re-invokes with the same inputs + checkpoint_dir and asserts the
resumed proof is byte-identical to an uninterrupted one and verifies."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_plonk_e2e import K, build_cs, witness

from zkdcap_tpu.commit import ParamsKZG, gen_srs
from zkdcap_tpu.fields import BN254_FR, mont
from zkdcap_tpu.plonk.checkpoint import Preempted
from zkdcap_tpu.plonk.keygen import keygen
from zkdcap_tpu.plonk.prover import create_proof
from zkdcap_tpu.plonk.verifier import verify_proof
from zkdcap_tpu.transcript import TranscriptWriter


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cache = tmp_path_factory.mktemp("srs")
    params = ParamsKZG(srs=gen_srs(K, cache_dir=str(cache)))
    cs, _ = build_cs()
    q_vals, t_vals, a_vals, b_vals, c_vals, inst = witness()
    pk = keygen(params, cs, [q_vals, t_vals])
    advice = [mont.encode_ints(BN254_FR, col) for col in (a_vals, b_vals, c_vals)]
    return params, pk, advice, inst


SEED = b"checkpoint-parity"


def test_resume_after_each_round_bit_identical(setup, tmp_path):
    params, pk, advice, inst = setup
    golden = create_proof(params, pk, advice, [inst],
                          TranscriptWriter("blake2b"), blinding_seed=SEED)
    for rnd in ("r1", "r2", "r3", "r4", "r5", "r6"):
        ckdir = str(tmp_path / rnd)
        with pytest.raises(Preempted):
            create_proof(params, pk, advice, [inst], TranscriptWriter("blake2b"),
                         blinding_seed=SEED, checkpoint_dir=ckdir,
                         _abort_after=rnd)
        assert os.listdir(ckdir), f"no checkpoint written for {rnd}"
        resumed = create_proof(params, pk, advice, [inst],
                               TranscriptWriter("blake2b"), blinding_seed=SEED,
                               checkpoint_dir=ckdir)
        assert resumed == golden, f"resume after {rnd} diverges"
        assert not [f for f in os.listdir(ckdir) if f.endswith(".npz")], \
            "checkpoints must be cleared after a finished proof"
    assert verify_proof(params, pk.vk, [inst], golden)


def test_resume_preserves_fresh_blinding(setup, tmp_path):
    """With the default fresh-entropy blinding, the seed must persist in
    the round-1 checkpoint so later rounds blind consistently."""
    params, pk, advice, inst = setup
    ckdir = str(tmp_path / "fresh")
    with pytest.raises(Preempted):
        create_proof(params, pk, advice, [inst], TranscriptWriter("blake2b"),
                     checkpoint_dir=ckdir, _abort_after="r3")
    resumed = create_proof(params, pk, advice, [inst],
                           TranscriptWriter("blake2b"), checkpoint_dir=ckdir)
    assert verify_proof(params, pk.vk, [inst], resumed)


def test_checkpoint_rejects_different_inputs(setup, tmp_path):
    params, pk, advice, inst = setup
    ckdir = str(tmp_path / "fp")
    with pytest.raises(Preempted):
        create_proof(params, pk, advice, [inst], TranscriptWriter("blake2b"),
                     blinding_seed=SEED, checkpoint_dir=ckdir, _abort_after="r1")
    with pytest.raises(AssertionError, match="different proof inputs"):
        create_proof(params, pk, advice, [[7]], TranscriptWriter("blake2b"),
                     blinding_seed=SEED, checkpoint_dir=ckdir)
