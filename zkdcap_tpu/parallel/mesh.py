"""Device-mesh construction for multi-chip proving.

The reference has NO distributed backend (rayon threads only, SURVEY.md
§2.3/§5.8); this module is the designed-from-scratch TPU equivalent:
a named `jax.sharding.Mesh` over all visible chips with one data axis
("shard"), used by the sharded MSM/NTT. Multi-host extension: pass the
global device list (jax.distributed handles process groups); the collective
patterns below are axis-name based and host-count agnostic.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def proving_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        assert len(devs) >= n_devices, f"need {n_devices} devices, have {len(devs)}"
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
