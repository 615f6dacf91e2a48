"""EVM layer: calldata codec + Solidity verifier generation."""

import pytest

from zkdcap_tpu.evm.calldata import decode_calldata, encode_calldata


def test_calldata_roundtrip():
    insts = [1, 2**200, 0]
    proof = bytes(range(64))
    data = encode_calldata(insts, proof)
    assert len(data) == 32 * 3 + 64
    got_i, got_p = decode_calldata(data, 3)
    assert got_i == insts and got_p == proof


@pytest.fixture(scope="module")
def tiny_pk(tmp_path_factory):
    from zkdcap_tpu.commit import ParamsKZG, gen_srs
    from zkdcap_tpu.plonk.keygen import keygen

    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_plonk_e2e import build_cs, witness, K

    params = ParamsKZG(srs=gen_srs(K, cache_dir=str(tmp_path_factory.mktemp("srs"))))
    cs, _ = build_cs()
    q_vals, t_vals, *_, inst = witness()
    return params, keygen(params, cs, [q_vals, t_vals])


def test_gen_solidity(tiny_pk):
    from zkdcap_tpu.evm.solidity import gen_evm_verifier

    params, pk = tiny_pk
    src = gen_evm_verifier(params, pk.vk, num_instances=1)
    assert src.count("{") == src.count("}")
    for needle in (
        "pragma solidity",
        "keccak256",
        "expectedH",
        "address(0x08)",  # pairing precompile
        "address(0x06)",  # ecAdd
        "address(0x07)",  # ecMul
        "fallback(bytes calldata)",
    ):
        assert needle in src, needle


def test_cli_parsing(tmp_path):
    from zkdcap_tpu.cli import main

    with pytest.raises(SystemExit):
        main([])  # missing subcommand
    # missing params dir guard (main.rs:256-263 behaviour)
    with pytest.raises(SystemExit) as e:
        main(["--params-dir", str(tmp_path / "nope"), "verify",
              "--msghash", "0x00", "--signature", "0x00", "--pubkey", "0x00",
              "--proof", "0x00"])
    assert e.value.code == 2
