"""Run the mesh-using test files in SUBPROCESS-isolated pytest sessions.

jaxlib 0.9's XLA:CPU destabilises once multi-device programs accumulate in
a process: late persistent-cache reads/writes and even raw backend_compile
SEGFAULT (observed five times at reproducible suite positions; never in a
fresh process — the driver's dryrun, which runs the same mesh proof code
standalone, is consistently green). tests/conftest.py excludes these files
from the main session (collect_ignore) and this runner executes each in
its own interpreter with ZKDCAP_MESH_INNER=1.
"""

import os
import subprocess
import sys

import pytest

from conftest import MESH_TEST_FILES

_HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.mark.parametrize("fname", MESH_TEST_FILES)
def test_mesh_file_isolated(fname):
    env = dict(os.environ)
    env["ZKDCAP_MESH_INNER"] = "1"
    res = subprocess.run(
        [sys.executable, "-m", "pytest", os.path.join(_HERE, fname), "-q"],
        capture_output=True, text=True,
        # the real-circuit mesh proof is one large multi-device XLA:CPU
        # compile that cannot use the persistent cache (see module
        # docstring); on few-core hosts (4-core VM observed 2026-08-21,
        # round-4 code included) it alone takes ~1.5 h, so give it room
        timeout=10800 if fname == "test_mesh_real_circuit.py" else 1800,
        cwd=os.path.join(_HERE, ".."), env=env,
    )
    assert res.returncode == 0, (
        f"{fname} failed in isolated run:\n{res.stdout[-4000:]}\n{res.stderr[-2000:]}"
    )
