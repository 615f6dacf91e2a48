"""Native witness replay binding (C++ engine via ctypes).

Falls back to the pure-Python evaluator when the shared library is not
built. Build: `make -C native` (produces native/libwitness_eval.so).
"""

from __future__ import annotations


def replay_native(tape, inputs):
    from .native import eval_tape

    if eval_tape is None:
        return None
    return eval_tape(tape, inputs)
