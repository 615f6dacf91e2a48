"""Device lookup multiset permute vs the host reference, EXACT equality.

The device program (`_lookup_permute_program_for`) must reproduce the host
`_permute_lookup_pair_rows` byte-for-byte — same memcmp sort order, same
first-occurrence matching, same filler pairing — because its output feeds
committed polynomials: any ordering difference changes proof bytes (golden
proofs, checkpoints, and mesh byte-identity all pin them).
"""

import types

import jax.numpy as jnp
import numpy as np
import pytest

from zkdcap_tpu.fields.params import NUM_LIMBS
from zkdcap_tpu.plonk.prover import (
    _lookup_permute_program_for,
    _permute_lookup_pair_rows,
)

K = 6
N = 1 << K
U = N - 7  # some blinding rows, like a real cs


def _fake_pk():
    cs = types.SimpleNamespace(usable_rows=lambda n: U)
    return types.SimpleNamespace(k=K, cs=cs)


def _rows(rng, values):
    """value list -> (N, L) u32 canonical 16-bit-limb rows (values small so
    duplicates are frequent; upper limbs get a shared random pattern so the
    lex compare exercises more than limb 0)."""
    out = np.zeros((N, NUM_LIMBS), np.uint32)
    for i, v in enumerate(values):
        out[i, 0] = v & 0xFFFF
        out[i, 1] = (v >> 16) & 0xFFFF
    out[:, 2] = rng.integers(0, 3, size=N)  # collisions in the middle limbs
    out[len(values):] = rng.integers(0, 1 << 16, size=(N - len(values), NUM_LIMBS))
    return out


def _run_device(a_std, s_std):
    prog = _lookup_permute_program_for(_fake_pk())
    ao, sp, valid = prog(jnp.asarray(a_std)[None], jnp.asarray(s_std)[None])
    return (np.asarray(ao[0]), np.asarray(sp[0]), bool(np.asarray(valid[0])))


def test_device_permute_matches_host_exactly():
    rng = np.random.default_rng(7)
    # table: values 0..15 each repeated, inputs drawn from the table values
    table_vals = list(range(16)) * (U // 16) + list(range(U % 16))
    in_vals = [int(v) for v in rng.choice(np.arange(16), size=U)]
    s_std = _rows(rng, table_vals)
    a_std = _rows(rng, in_vals)
    # inputs must be drawn from table ROWS (middle limbs must match too)
    idx = rng.integers(0, U, size=U)
    a_std[:U] = s_std[idx]
    host_ao, host_sp = _permute_lookup_pair_rows(a_std[:U], s_std[:U])
    dev_ao, dev_sp, valid = _run_device(a_std, s_std)
    assert valid
    np.testing.assert_array_equal(dev_ao, host_ao.astype(np.int32))
    np.testing.assert_array_equal(dev_sp, host_sp.astype(np.int32))


def test_device_permute_all_equal_and_degenerate():
    rng = np.random.default_rng(8)
    # every row identical: one group containing everything
    s_std = np.tile(np.arange(NUM_LIMBS, dtype=np.uint32)[None] % 7, (N, 1))
    a_std = s_std.copy()
    host_ao, host_sp = _permute_lookup_pair_rows(a_std[:U], s_std[:U])
    dev_ao, dev_sp, valid = _run_device(a_std, s_std)
    assert valid
    np.testing.assert_array_equal(dev_ao, host_ao.astype(np.int32))
    np.testing.assert_array_equal(dev_sp, host_sp.astype(np.int32))


def test_device_permute_missing_value_flags_invalid():
    rng = np.random.default_rng(9)
    s_std = _rows(rng, list(range(8)) * (U // 8 + 1))
    a_std = s_std.copy()
    a_std[3, 0] = 0xBEEF  # not in the table
    a_std[3, 2] = 9  # nor in any middle-limb pattern
    with pytest.raises(ValueError):
        _permute_lookup_pair_rows(a_std[:U], s_std[:U])
    _, _, valid = _run_device(a_std, s_std)
    assert not valid
