"""Sharded MSM/NTT on the 8-virtual-device CPU mesh (SURVEY.md §4 note)."""

import numpy as np

from zkdcap_tpu.curves import BN254_G1
from zkdcap_tpu.curves.device_g1 import G1_SPEC, decode_points, encode_points
from zkdcap_tpu.fields import BN254_FR, mont
from zkdcap_tpu.ntt import ntt
from zkdcap_tpu.parallel import proving_mesh, sharded_msm, sharded_ntt


def test_sharded_msm_matches_single():
    mesh = proving_mesh(8)
    n = 64
    pts_host = [BN254_G1.mul(3 * i + 1, BN254_G1.g) for i in range(n)]
    scalars_int = [(5 * i + 7) for i in range(n)]
    pts = encode_points(G1_SPEC, pts_host)
    scal = mont.encode_ints(BN254_FR, scalars_int)
    R = sharded_msm(mesh, pts, scal)
    got = decode_points(G1_SPEC, tuple(r[None] for r in R))[0]
    assert got == BN254_G1.msm(scalars_int, pts_host)


def test_sharded_ntt_matches_single():
    mesh = proving_mesh(8)
    for log_n in (8, 10):
        n = 1 << log_n
        vals = [(i * 31337 + 5) % BN254_FR.p for i in range(n)]
        a = mont.encode_ints(BN254_FR, vals)
        out = sharded_ntt(mesh, a)
        ref = ntt(BN254_FR, a)
        assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_graft_entry():
    """Run the driver entry file end-to-end in a SUBPROCESS (exactly how the
    driver invokes it). In-process, compiling the entry step after this
    file's shard_map tests SEGFAULTS inside jaxlib 0.9's XLA:CPU
    (backend_compile / serialize_executable — observed at the same suite
    position across three runs); a fresh process is deterministic."""
    import os
    import subprocess
    import sys

    root = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # __main__ sets its own device count/timeouts
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, os.path.join(root, "__graft_entry__.py")],
        capture_output=True, text=True, timeout=900, cwd=root, env=env,
    )
    assert res.returncode == 0, f"graft entry failed:\n{res.stdout}\n{res.stderr}"
    assert "byte-identical + verified" in res.stdout
