"""KZG commitment scheme over BN254 (halo2 KZGCommitmentScheme equivalent).

Commitments are MSMs against the SRS (SURVEY.md §3.1 steps 2-5: "commit
advice columns — MSM per column [Pallas MSM]"). Polys in Lagrange form are
converted through the coefficient basis with a scalar NTT rather than
maintaining an EC-NTT'd Lagrange SRS — the NTT is vastly cheaper than the
MSM it precedes.
"""

from __future__ import annotations

import dataclasses

import jax

from ..curves.device_g1 import G1_SPEC
from ..fields import BN254_FR, mont
from ..msm.pippenger import msm_host
from ..ntt import intt
from .srs import SRS

Affine = tuple[int, int] | None


@dataclasses.dataclass
class ParamsKZG:
    srs: SRS

    @property
    def k(self) -> int:
        return self.srs.k

    @property
    def n(self) -> int:
        return self.srs.n

    def commit(self, coeffs: jax.Array, mesh=None) -> Affine:
        """Commit to a coefficient-form poly (m <= n coefficients).

        With `mesh`, the MSM shards its points across the mesh devices
        (parallel/sharded_msm) — the multi-chip path of SURVEY.md §2.3
        row 1; results are bit-identical to single-chip."""
        m = coeffs.shape[0]
        assert m <= self.n, f"poly degree {m} exceeds SRS size {self.n}"
        if mesh is not None:
            from ..curves.device_g1 import decode_points
            from ..parallel.sharded_msm import sharded_msm

            R3 = sharded_msm(mesh, self.srs.g1_powers[:m], coeffs, G1_SPEC)
            return decode_points(G1_SPEC, tuple(r[None] for r in R3))[0]
        return msm_host(self.srs.g1_powers[:m], coeffs, G1_SPEC)

    def commit_lagrange(self, evals: jax.Array, mesh=None) -> Affine:
        return self.commit(intt(BN254_FR, evals), mesh=mesh)

    def commit_many(self, coeffs_list, mesh=None) -> list[Affine]:
        """One batched MSM for many polys (per-round multi-column commits).
        With `mesh`, each commitment's points are sharded across chips."""
        if not coeffs_list:
            return []
        m = max(c.shape[0] for c in coeffs_list)
        assert m <= self.n
        if mesh is not None:
            return [self.commit(c, mesh=mesh) for c in coeffs_list]
        from ..msm.pippenger import msm_many_host

        return msm_many_host(self.srs.g1_powers[:m], list(coeffs_list), G1_SPEC)
