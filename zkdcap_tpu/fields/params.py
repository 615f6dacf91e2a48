"""Field parameters for the curves the stack needs.

Capability parity with the reference's `halo2curves` forks (SURVEY.md §2.2
D-CURVE; reference cites `circuits/src/sgx_dcap_verifier.rs:12`,
`crates/p256-ecdsa/src/lib.rs:10-13`):

  * BN254 scalar field Fr (the PLONK/KZG field) and base field Fq.
  * secp256r1 (P-256) base field Fp and scalar field Fq — the headline
    capability the reference forked halo2curves to obtain.

Device representation: a field element is a little-endian vector of
``NUM_LIMBS = 16`` limbs of ``LIMB_BITS = 16`` bits stored as ``uint32``.
16-bit limbs are chosen for the TPU VPU: a 16x16-bit product fits exactly in
a uint32 lane, so schoolbook multiplication needs no widening, and column
sums of lo/hi halves stay far below 2^32 (SURVEY.md §7.4 item 1).

Hot-path arithmetic is in Montgomery form with R = 2^256.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

LIMB_BITS = 16
NUM_LIMBS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
R_BITS = LIMB_BITS * NUM_LIMBS  # 256
R = 1 << R_BITS


def int_to_limbs(x: int, num_limbs: int = NUM_LIMBS, limb_bits: int = LIMB_BITS) -> np.ndarray:
    """Little-endian limb decomposition of a non-negative int."""
    assert x >= 0
    mask = (1 << limb_bits) - 1
    out = np.empty((num_limbs,), dtype=np.uint32)
    for i in range(num_limbs):
        out[i] = x & mask
        x >>= limb_bits
    assert x == 0, "value does not fit in limbs"
    return out


def limbs_to_int(limbs, limb_bits: int = LIMB_BITS) -> int:
    """Inverse of :func:`int_to_limbs` (accepts any integer array-like)."""
    x = 0
    arr = np.asarray(limbs)
    for i in range(arr.shape[-1] - 1, -1, -1):
        x = (x << limb_bits) | int(arr[..., i])
    return x


@dataclasses.dataclass(frozen=True)
class FieldParams:
    """Static parameters of a prime field, precomputed on host.

    ``n0inv`` is ``-p^{-1} mod 2^LIMB_BITS`` (Montgomery REDC constant),
    ``r2`` is ``R^2 mod p`` (to-Montgomery conversion multiplier).
    """

    name: str
    p: int
    # Multiplicative generator + 2-adicity for NTT fields (0 if unused).
    generator: int = 0
    two_adicity: int = 0

    @functools.cached_property
    def n0inv(self) -> int:
        return (-pow(self.p, -1, 1 << LIMB_BITS)) & LIMB_MASK

    @functools.cached_property
    def r_mod_p(self) -> int:
        return R % self.p

    @functools.cached_property
    def r2(self) -> int:
        return (R * R) % self.p

    @functools.cached_property
    def r3(self) -> int:
        return (R * R * R) % self.p

    @functools.cached_property
    def p_limbs(self) -> np.ndarray:
        return int_to_limbs(self.p)

    @functools.cached_property
    def root_of_unity(self) -> int:
        """2^two_adicity-th primitive root of unity (for NTT fields)."""
        assert self.two_adicity > 0
        odd = (self.p - 1) >> self.two_adicity
        w = pow(self.generator, odd, self.p)
        assert pow(w, 1 << self.two_adicity, self.p) == 1
        assert pow(w, 1 << (self.two_adicity - 1), self.p) != 1
        return w

    def nth_root_of_unity(self, log_n: int) -> int:
        assert log_n <= self.two_adicity
        return pow(self.root_of_unity, 1 << (self.two_adicity - log_n), self.p)


# --- BN254 (alt_bn128) ------------------------------------------------------
# Scalar field Fr: the field of all PLONK polynomials / witnesses.
# generator 7 is the canonical multiplicative generator used by halo2curves;
# Fr has 2-adicity 28 (r - 1 = 2^28 * 81540058820840996586704275553141814055101440848469862132140264610111).
BN254_FR = FieldParams(
    name="bn254_fr",
    p=21888242871839275222246405745257275088548364400416034343698204186575808495617,
    generator=7,
    two_adicity=28,
)

# Base field Fq: coordinates of G1 points (MSM arithmetic field).
BN254_FQ = FieldParams(
    name="bn254_fq",
    p=21888242871839275222246405745257275088696311157297823662689037894645226208583,
)

# --- secp256r1 (NIST P-256) -------------------------------------------------
# Base field (coordinates):
SECP256R1_FP = FieldParams(
    name="secp256r1_fp",
    p=0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF,
)
# Scalar field (ECDSA signature field):
SECP256R1_FQ = FieldParams(
    name="secp256r1_fq",
    p=0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551,
)

ALL_FIELDS = (BN254_FR, BN254_FQ, SECP256R1_FP, SECP256R1_FQ)
