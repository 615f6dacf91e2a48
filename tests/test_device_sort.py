"""Pallas bitonic sort kernel (interpret mode on the CPU suite).

The TPU MSM pipeline sorts per-window digits (and, on the fused path, the
packed point rows themselves) with zkdcap_tpu/utils/device_sort.py instead
of lax.sort (ref: halo2 Pippenger's per-window bucket grouping,
SURVEY.md §2.3 row 1). These tests pin the kernel's sort semantics against
lax.sort / numpy on small sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkdcap_tpu.utils.device_sort import (
    bitonic_sort,
    sort_rows_by_key,
    sort_supported,
)


def test_bitonic_sort_matches_lax_sort():
    rng = np.random.default_rng(0)
    n = 1 << 10
    keys = rng.integers(0, 1 << 16, n, dtype=np.uint32)
    pay = np.arange(n, dtype=np.uint32)
    sk, sp = bitonic_sort((jnp.asarray(keys), jnp.asarray(pay)))
    sk, sp = np.asarray(sk), np.asarray(sp)
    assert np.array_equal(sk, np.sort(keys))
    # (key, payload) pairs survive as a permutation of the input pairs
    assert set(zip(sk.tolist(), sp.tolist())) == set(
        zip(keys.tolist(), pay.tolist())
    )


def test_bitonic_sort_batched_single_operand():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 1 << 30, (3, 1024), dtype=np.uint32)
    (sk,) = bitonic_sort((jnp.asarray(keys),))
    for b in range(3):
        assert np.array_equal(np.asarray(sk)[b], np.sort(keys[b]))


def test_sort_supported_bounds():
    assert sort_supported(1 << 10)
    assert sort_supported(1 << 20)
    assert not sort_supported(1 << 9)
    assert not sort_supported(3 * 1024)
    assert not sort_supported(1 << 22)


def test_sort_rows_by_key_shared_and_per_window():
    rng = np.random.default_rng(2)
    n, n_w, p = 1 << 10, 2, 3
    key = rng.integers(0, 1 << 12, (n_w, n), dtype=np.uint32)
    planes = rng.integers(0, 1 << 31, (p, n), dtype=np.uint32)
    sk, spl = sort_rows_by_key(jnp.asarray(key), jnp.asarray(planes), False)
    sk, spl = np.asarray(sk), np.asarray(spl)
    for w in range(n_w):
        order = np.argsort(key[w], kind="stable")
        assert np.array_equal(sk[w], key[w][order])
        # rows travel with their key: regroup and compare as multisets
        got = sorted(zip(sk[w].tolist(), spl[w].T.tolist()))
        want = sorted(zip(key[w].tolist(), planes.T.tolist()))
        assert got == want
    # per-window planes: distinct planes per window stay with their window
    pw = rng.integers(0, 1 << 31, (n_w, p, n), dtype=np.uint32)
    sk2, spl2 = sort_rows_by_key(jnp.asarray(key), jnp.asarray(pw), True)
    sk2, spl2 = np.asarray(sk2), np.asarray(spl2)
    for w in range(n_w):
        assert np.array_equal(sk2[w], np.sort(key[w]))
        got = sorted(zip(sk2[w].tolist(), spl2[w].T.tolist()))
        want = sorted(zip(key[w].tolist(), pw[w].T.tolist()))
        assert got == want
