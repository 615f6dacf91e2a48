"""zkdcap_tpu — a TPU-native halo2-style zero-knowledge proving stack.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
CliqueOfficial/zk-dcap-verifier (see SURVEY.md): a PLONKish proving system
(KZG over BN254, SHPLONK multi-open), a gate/chip eDSL (flex gate, range
checks, CRT big-integer non-native arithmetic, elliptic-curve + ECDSA chips,
dynamic SHA-256, base64), application circuits for Intel SGX DCAP
remote-attestation verification, and an artifact/CLI lifecycle — with the
polynomial/MSM hot paths running batched on TPU via JAX + Pallas and scaling
over a `jax.sharding.Mesh`.

Layer map (mirrors SURVEY.md §1, TPU-native design):
  L0  parallel/        mesh + collectives (replaces rayon; SURVEY §2.3)
  L1  fields/ curves/  limb-vector field & curve arithmetic (halo2curves equiv)
      ntt/ msm/        radix-2 NTT + Pippenger MSM device kernels
  L2  plonk/ commit/   PLONKish prover/verifier, KZG+SHPLONK (halo2_proofs equiv)
      transcript/
  L3  evm/             verifier export + calldata (snark-verifier equiv)
  L4  chips/           gate/chip eDSL (halo2-base / halo2-ecc / sha256 equiv)
  L5  circuits/        P-256 ECDSA + SGX DCAP application circuits
  L6  runtime/         prover lifecycle, artifacts, pinning (base.rs equiv)
  L7  cli.py           `zk-clique`-equivalent command line
"""

__version__ = "0.1.0"
