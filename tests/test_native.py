"""Native C++ layout kernel vs the pure-python fallback."""

import numpy as np

from zkdcap_tpu.plonk.cs import ConstraintSystem
from zkdcap_tpu.plonk.keygen import _UnionFind, permutation_mappings
from zkdcap_tpu.runtime.native import permutation_mapping_native


def _python_mapping(m, n, copies):
    uf = _UnionFind(m * n)
    for ca, ra, cb, rb in copies:
        uf.union(ca * n + ra, cb * n + rb)
    groups = {}
    for cell in range(m * n):
        groups.setdefault(uf.find(cell), []).append(cell)
    mapping = np.empty((m, n, 2), dtype=np.int32)
    for members in groups.values():
        for i, cell in enumerate(members):
            nxt = members[(i + 1) % len(members)]
            mapping[cell // n, cell % n] = (nxt // n, nxt % n)
    return mapping


def test_native_builds_and_matches():
    import random

    rng = random.Random(4)
    m, n = 3, 64
    copies = [
        (rng.randrange(m), rng.randrange(n), rng.randrange(m), rng.randrange(n))
        for _ in range(50)
    ]
    arr = np.array(copies, dtype=np.int64)
    native = permutation_mapping_native(m, n, arr)
    assert native is not None, "native lib failed to build"
    # both must be valid permutations with the same cycle partition
    py = _python_mapping(m, n, copies)

    def cycles(mapping):
        seen = set()
        parts = []
        for c in range(m):
            for r_ in range(n):
                if (c, r_) in seen:
                    continue
                cyc = []
                cur = (c, r_)
                while cur not in seen:
                    seen.add(cur)
                    cyc.append(cur)
                    cur = tuple(int(v) for v in mapping[cur[0], cur[1]])
                parts.append(frozenset(cyc))
        return set(parts)

    assert cycles(native) == cycles(py)
