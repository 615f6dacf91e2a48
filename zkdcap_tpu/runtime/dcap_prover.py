"""DCAP prover lifecycle: keygen/artifact cache/prove/verify for the k=17
SGX DCAP circuit (same artifact design as runtime/prover.py, reference
SURVEY.md §5.4 — the reference's stack A never got a production lifecycle;
this gives the DCAP circuit the stack-B treatment)."""

from __future__ import annotations

import json
import os

import numpy as np

from .. import metrics
from ..chips import CircuitBuilder, Pinning
from ..circuits.dcap import DCAP_LOOKUP_BITS, DcapInput, build_dcap_trace, load_demo_input
from ..commit import ParamsKZG, gen_srs
from ..fields import BN254_FR, mont
from ..ntt import Domain
from ..plonk.keygen import ProvingKey, VerifyingKey, keygen
from ..plonk.prover import create_proof
from ..plonk.verifier import verify_proof
from ..transcript import TranscriptWriter


class DcapProver:
    K_DEFAULT = 17  # sgx_dcap_verifier.rs:765

    def __init__(self, params_dir: str = "params", k: int = K_DEFAULT,
                 transcript: str = "blake2b"):
        self.params_dir = params_dir
        self.k = k
        self.transcript_kind = transcript
        self.lookup_bits = min(DCAP_LOOKUP_BITS, k - 1)
        self._pk = None
        self._params = None
        self._builder = None
        self._compiled = None

    @property
    def pk_path(self):
        return os.path.join(self.params_dir, f"dcap_pk_k{self.k}.npz")

    @property
    def pinning_path(self):
        return os.path.join(self.params_dir, f"dcap_pinning_k{self.k}.json")

    @property
    def vk_path(self):
        return os.path.join(self.params_dir, f"dcap_vk_k{self.k}.json")

    def params(self) -> ParamsKZG:
        if self._params is None:
            self._params = ParamsKZG(srs=gen_srs(self.k, cache_dir=self.params_dir))
        return self._params

    @property
    def tape_path(self):
        return os.path.join(self.params_dir, f"dcap_tape_k{self.k}.npz")

    def _compile(self, pinning: Pinning | None = None):
        trace = build_dcap_trace(load_demo_input(), self.lookup_bits)
        builder = CircuitBuilder(self.k, lookup_bits=self.lookup_bits)
        compiled = builder.compile(trace, pinning)
        self._structure_ctx = trace  # structural index lists for witness fill
        return builder, compiled

    def _get_tape(self):
        """Witness tape (compiled witness generation): load or record+cache."""
        if getattr(self, "_tape", None) is not None:
            return self._tape
        from ..witness.tape import WitnessTape, record

        if os.path.exists(self.tape_path):
            try:
                self._tape = WitnessTape.load(self.tape_path)
                return self._tape
            except Exception:
                pass  # corrupt artifact: re-record (same policy as pk)
        _, tape = record(
            lambda tr: build_dcap_trace(load_demo_input(), self.lookup_bits, tracer=tr)
        )
        os.makedirs(self.params_dir, exist_ok=True)
        tape.save(self.tape_path)
        self._tape = tape
        return tape

    def keygen(self, force: bool = False) -> ProvingKey:
        os.makedirs(self.params_dir, exist_ok=True)
        if not force and self._pk is not None:
            return self._pk
        if not force and os.path.exists(self.pk_path) and os.path.exists(self.pinning_path):
            try:
                return self._load()
            except Exception:
                pass
        builder, compiled = self._compile()
        pk = keygen(self.params(), compiled.cs, compiled.fixed_values, self.transcript_kind)
        self._pk, self._builder, self._compiled = pk, builder, compiled
        self._save(pk, compiled.pinning)
        return pk

    def _save(self, pk: ProvingKey, pinning: Pinning) -> None:
        import jax

        with open(self.pinning_path, "w") as f:
            f.write(pinning.to_json())
        arrays = {}
        for name in ("fixed_lagrange", "fixed_coeff", "fixed_extended",
                     "sigma_lagrange", "sigma_coeff", "sigma_extended"):
            lst = getattr(pk, name)
            if lst:
                arrays[name] = np.stack([np.asarray(jax.device_get(a)) for a in lst])
        for name in ("l0_ext", "llast_ext", "lblind_ext", "zh_inv_ext"):
            arrays[name] = np.asarray(jax.device_get(getattr(pk, name)))
        np.savez_compressed(self.pk_path, **arrays)
        with open(self.vk_path, "w") as f:
            json.dump(
                {
                    "k": pk.vk.k,
                    "transcript": pk.vk.transcript_kind,
                    "fixed_commitments": [list(c) if c else None for c in pk.vk.fixed_commitments],
                    "permutation_commitments": [
                        list(c) if c else None for c in pk.vk.permutation_commitments
                    ],
                },
                f,
            )

    def _load(self) -> ProvingKey:
        import jax
        import jax.numpy as jnp

        with open(self.pinning_path) as f:
            pinning = Pinning.from_json(f.read())
        builder, compiled = self._compile(pinning)
        with open(self.vk_path) as f:
            vk_data = json.load(f)
        data = np.load(self.pk_path)
        vk = VerifyingKey(
            k=self.k,
            cs=compiled.cs,
            fixed_commitments=[tuple(c) if c else None for c in vk_data["fixed_commitments"]],
            permutation_commitments=[
                tuple(c) if c else None for c in vk_data["permutation_commitments"]
            ],
            transcript_kind=vk_data["transcript"],
        )
        domain = Domain(BN254_FR, self.k, compiled.cs.extended_k(self.k))
        lists = {
            name: [jnp.asarray(a) for a in data[name]] if name in data else []
            for name in ("fixed_lagrange", "fixed_coeff", "fixed_extended",
                         "sigma_lagrange", "sigma_coeff", "sigma_extended")
        }
        pk = ProvingKey(
            vk=vk,
            domain=domain,
            fixed_values=compiled.fixed_values,
            l0_ext=jnp.asarray(data["l0_ext"]),
            llast_ext=jnp.asarray(data["llast_ext"]),
            lblind_ext=jnp.asarray(data["lblind_ext"]),
            zh_inv_ext=jnp.asarray(data["zh_inv_ext"]),
            **lists,
        )
        self._pk, self._builder, self._compiled = pk, builder, compiled
        return pk

    def create_proof(self, inp: DcapInput, timing: bool = True,
                     shards: int | None = None,
                     checkpoint: bool = False) -> bytes:
        import sys

        import jax.numpy as jnp

        from ..circuits.dcap import trace_inputs

        pk = self.keygen()
        # compiled witness generation (SURVEY.md §2.3 row 3): native tape
        # replay; python re-trace only as fallback
        raw = None
        try:
            from ..witness.native import eval_tape_raw

            raw = eval_tape_raw(self._get_tape(), trace_inputs(inp))
        except Exception as e:
            print(f"[runtime] tape replay unavailable ({e}); python trace", file=sys.stderr)
        if raw is None:
            from ..witness.tape import cells_u16

            trace = build_dcap_trace(inp, self.lookup_bits)
            raw = cells_u16(trace.cells)
        limbs = self._builder.witness_limbs(self._compiled, self._structure_ctx, raw)
        adv = mont.to_mont(BN254_FR, jnp.asarray(limbs.astype(np.uint32)))
        advice_dev = [adv[i] for i in range(adv.shape[0])]
        tw = TranscriptWriter(pk.vk.transcript_kind)
        mesh = None
        if shards is not None and shards > 1:
            from ..parallel import proving_mesh

            mesh = proving_mesh(shards)
        proof = create_proof(self.params(), pk, advice_dev, [], tw, timing=timing,
                             mesh=mesh,
                             checkpoint_dir=self.params_dir if checkpoint else None)
        metrics.dump(os.path.join(self.params_dir, "metrics.jsonl"))
        return proof

    def load_vk(self) -> VerifyingKey:
        """Light verifier path: vk from vk.json + pinning without the pk
        arrays (VERDICT round-1 weak #6)."""
        if self._pk is not None:
            return self._pk.vk
        if not (os.path.exists(self.vk_path) and os.path.exists(self.pinning_path)):
            return self.keygen().vk
        with open(self.pinning_path) as f:
            pinning = Pinning.from_json(f.read())
        builder, compiled = self._compile(pinning)
        with open(self.vk_path) as f:
            vk_data = json.load(f)
        self._builder, self._compiled = builder, compiled
        return VerifyingKey(
            k=self.k,
            cs=compiled.cs,
            fixed_commitments=[tuple(c) if c else None for c in vk_data["fixed_commitments"]],
            permutation_commitments=[
                tuple(c) if c else None for c in vk_data["permutation_commitments"]
            ],
            transcript_kind=vk_data["transcript"],
        )

    def verifier_params(self) -> ParamsKZG:
        if self._params is not None:
            return self._params
        from ..commit.srs import SRS, _dev_tau
        from ..curves.pairing import G2_GEN, g2_mul

        tau = _dev_tau()
        return ParamsKZG(srs=SRS(k=self.k, g1_powers=None, g2=G2_GEN,
                                 s_g2=g2_mul(tau, G2_GEN), g1=(1, 2)))

    def verify(self, proof: bytes) -> bool:
        vk = self.load_vk()
        return verify_proof(self.verifier_params(), vk, [], proof)
