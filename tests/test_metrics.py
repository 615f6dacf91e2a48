"""Structured metrics registry (SURVEY.md §5.5)."""

import json
import os

from zkdcap_tpu import metrics


def test_record_rates_and_dump(tmp_path):
    metrics.clear()
    rec = metrics.record("kernel.x", 2.0, items=4_000_000, nbytes=8_000_000_000,
                         k=18)
    assert rec["items_per_s"] == 2_000_000.0
    assert rec["gb_per_s"] == 4.0
    assert rec["k"] == 18
    with metrics.timer("phase.y", items=10):
        pass
    assert len(metrics.snapshot()) == 2
    path = str(tmp_path / "m.jsonl")
    n = metrics.dump(path)
    assert n == 2 and metrics.snapshot() == []
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["name"] == "kernel.x"
    assert lines[1]["name"] == "phase.y" and lines[1]["seconds"] >= 0
    # dump appends
    metrics.record("z", 1.0)
    metrics.dump(path)
    assert len(open(path).read().splitlines()) == 3


def test_env_sink_stderr_keeps_registry(tmp_path, capfd):
    metrics.clear()
    os.environ["ZKDCAP_METRICS"] = "stderr"
    try:
        metrics.record("w", 0.5)
    finally:
        del os.environ["ZKDCAP_METRICS"]
    err = capfd.readouterr().err
    assert "[metrics]" in err and '"w"' in err
    assert metrics.snapshot()[-1]["name"] == "w"
    metrics.clear()
