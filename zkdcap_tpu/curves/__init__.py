from .host_curve import BN254_G1, SECP256R1, CurveParams, p256_ecdsa_verify
