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

    def commit(self, coeffs: jax.Array) -> Affine:
        """Commit to a coefficient-form poly (m <= n coefficients)."""
        m = coeffs.shape[0]
        assert m <= self.n, f"poly degree {m} exceeds SRS size {self.n}"
        return msm_host(self.srs.g1_powers[:m], coeffs, G1_SPEC)

    def commit_lagrange(self, evals: jax.Array) -> Affine:
        return self.commit(intt(BN254_FR, evals))

    def commit_many(self, coeffs_list) -> list[Affine]:
        """One batched MSM for many polys (per-round multi-column commits)."""
        from ..msm.pippenger import msm_many_host

        if not coeffs_list:
            return []
        m = max(c.shape[0] for c in coeffs_list)
        assert m <= self.n
        return msm_many_host(self.srs.g1_powers[:m], list(coeffs_list), G1_SPEC)
