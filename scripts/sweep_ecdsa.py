"""Degree/column tradeoff sweep (reference `bench_ecdsa.config` analog).

The reference sweeps k=19..11 by pinning num_advice per config
(`circuits/src/configs/bench_ecdsa.config:1-9`); our builder auto-shapes
(halo2-base `calculate_params` analog), so the sweep reports the DERIVED
shape per degree — the same rows-vs-columns curve — plus MockProver timing
(add --mock) for each point.

Run: python scripts/sweep_ecdsa.py [configs/bench_ecdsa.config] [--mock]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    from zkdcap_tpu.chips import CircuitBuilder
    from zkdcap_tpu.circuits.p256_ecdsa import build_ecdsa_trace
    from zkdcap_tpu.config import load_sweep
    from zkdcap_tpu.runtime.prover import SAMPLE_INPUT

    path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else \
        os.path.join(os.path.dirname(__file__), "..", "configs", "bench_ecdsa.config")
    do_mock = "--mock" in sys.argv

    print(f"{'k':>3} {'rows':>8} {'advice':>7} {'lookup':>7} {'fixed':>6} "
          f"{'cells':>9} {'trace_s':>8} {'layout_s':>9}" + ("  mock_s" if do_mock else ""))
    for cfg in load_sweep(path):
        t0 = time.time()
        trace = build_ecdsa_trace(SAMPLE_INPUT, cfg.lookup_bits)
        t_trace = time.time() - t0
        t0 = time.time()
        builder = CircuitBuilder(cfg.degree, lookup_bits=cfg.lookup_bits)
        compiled = builder.compile(trace)
        t_layout = time.time() - t0
        pin = compiled.pinning
        row = (f"{cfg.degree:>3} {1 << cfg.degree:>8} {pin.num_advice:>7} "
               f"{pin.num_lookup_advice:>7} {compiled.cs.num_fixed:>6} "
               f"{pin.num_cells:>9} {t_trace:>8.2f} {t_layout:>9.2f}")
        if do_mock:
            from zkdcap_tpu.plonk.mock import MockProver

            advice = builder.witness_columns(compiled, trace)
            t0 = time.time()
            MockProver(cfg.degree, compiled.cs, compiled.fixed_values, advice,
                       builder.instance_values(trace)).assert_satisfied()
            row += f"  {time.time()-t0:.2f}"
        print(row, flush=True)
        result = {
            "degree": cfg.degree,
            "num_advice": pin.num_advice,
            "num_lookup_advice": pin.num_lookup_advice,
            "num_fixed": compiled.cs.num_fixed,
            "cells": pin.num_cells,
        }
        with open("/tmp/zkdcap_sweep.jsonl", "a") as f:
            f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
