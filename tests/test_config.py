"""Config-file system (reference ECDSA_CONFIG / CircuitParams analog)."""

import os

from zkdcap_tpu.config import CircuitConfig, load_config, load_sweep

REF_LINE = ('{"strategy":"Simple","degree":17,"num_advice":4,'
            '"num_lookup_advice":1,"num_fixed":1,"lookup_bits":16,'
            '"limb_bits":88,"num_limbs":3}')


def test_reference_schema_parses():
    cfg = CircuitConfig.from_json(REF_LINE)
    assert cfg.degree == 17 and cfg.lookup_bits == 16
    assert cfg.num_advice == 4  # kept as an expectation
    cfg.validate()


def test_env_var_selection(tmp_path, monkeypatch):
    p = tmp_path / "my.config"
    p.write_text('{"degree":14,"lookup_bits":13}\n')
    monkeypatch.setenv("ZKDCAP_CONFIG", str(p))
    cfg = load_config()
    assert cfg.degree == 14 and cfg.lookup_bits == 13


def test_default_config_file():
    cfg = load_config()
    assert cfg.degree == 18 and cfg.lookup_bits == 17  # configs/ecdsa_circuit.config


def test_sweep_loader():
    path = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "bench_ecdsa.config")
    sweep = load_sweep(path)
    assert [c.degree for c in sweep] == [18, 17, 16, 15, 14, 13, 12]
    for c in sweep:
        c.validate()


def test_cli_accepts_config(tmp_path):
    import pytest

    from zkdcap_tpu.cli import main

    p = tmp_path / "cfg.config"
    p.write_text('{"degree":13,"lookup_bits":12}\n')
    # verify guard still fires with config given and no params dir
    with pytest.raises(SystemExit) as e:
        main(["--params-dir", str(tmp_path / "nope"), "--config", str(p),
              "verify", "--msghash", "0x00", "--signature", "0x00",
              "--pubkey", "0x00", "--proof", "0x00"])
    assert e.value.code == 2


def test_validate_rejects_bad_values():
    """validate() must raise ValueError (not assert: survives python -O)
    for values outside the reference instance-encoding contract."""
    import pytest

    good = dict(degree=17, lookup_bits=16)
    with pytest.raises(ValueError, match="3 limbs"):
        CircuitConfig(**good, num_limbs=4).validate()
    with pytest.raises(ValueError, match="limb_bits"):
        CircuitConfig(**good, limb_bits=64).validate()
    with pytest.raises(ValueError, match="lookup table"):
        CircuitConfig(degree=12, lookup_bits=12).validate()
    with pytest.raises(ValueError, match="multiopen"):
        CircuitConfig(**good, multiopen="ipa").validate()
