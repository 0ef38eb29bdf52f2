"""Engine configuration.

The reference's knobs are cargo features plus the (Language, width,
is_opcode_supported) triple fed to ``compiler::compile`` (SURVEY.md section 5,
"Config / flag system").  Here they are one explicit object covering field
choice, compile target, batch sizing, mesh shape, and kernel/fallback policy.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

from .fields.params import FieldParams, BN254_FR, get_field


@dataclass
class EngineConfig:
    # Field: "bn254" (default) or "bls12_381", mirroring the cargo features.
    field: str = "bn254"

    # Compile target: "plonk-csat" with `width`, or "r1cs" (passthrough).
    language: str = "plonk-csat"
    width: int = 3

    # Batched solver sizing.
    batch_size: int = 1024

    # Mesh: axis sizes for (data,) — instance data parallelism.  None = single
    # device.  Multi-host setups build the mesh over jax.distributed devices.
    mesh_shape: Optional[Tuple[int, ...]] = None
    mesh_axis_names: Tuple[str, ...] = ("data",)

    # Kernel selection: allow disabling device gadget kernels (forcing the
    # host-stage path) for debugging/conformance bisection.
    device_hash_kernels: bool = True
    device_brillig_trace: bool = True

    # Fallback policy: expand unsupported black-box calls into gates at compile
    # time (the reference gates hash fallbacks behind `unstable-fallbacks`).
    enable_hash_fallbacks: bool = True

    # Pedersen generator escape hatch: an externally-supplied table of (x, y)
    # points for domain_separator 0 (docs/pedersen_compat.md — barretenberg's
    # derivation is sealed inside its WASM binary; deployments that hold the
    # real table inject it here and get bit-exact commitments through both
    # engines).  Applied via blackbox.grumpkin.set_external_generators the
    # first time this config builds a plan or solver.
    pedersen_generators: Optional[Tuple[Tuple[int, int], ...]] = None

    def field_params(self) -> FieldParams:
        return get_field(self.field)

    def language_object(self):
        from .compiler import PLONKCSat, R1CS

        if self.language == "r1cs":
            return R1CS()
        if self.language == "plonk-csat":
            return PLONKCSat(self.width)
        raise ValueError(f"unknown language {self.language!r}")

    # -- construction hub -----------------------------------------------------
    def compile(self, circuit, is_opcode_supported=None):
        """Run the backend-targeting compiler under this config (language,
        width, hash-fallback policy)."""
        from .compiler import compile as acvm_compile, default_is_opcode_supported

        language = self.language_object()
        if is_opcode_supported is None:
            is_opcode_supported = default_is_opcode_supported(language)
        return acvm_compile(
            circuit,
            language,
            is_opcode_supported,
            enable_hash_fallbacks=self.enable_hash_fallbacks,
        )

    def _apply_generators(self):
        # Config-installed tables are tracked so that using a config WITHOUT
        # an injected table clears a table a previous config installed (the
        # module-global external-generator store would otherwise leak across
        # EngineConfigs).  Tables installed directly through
        # blackbox.grumpkin.set_external_generators are left alone.
        global _GENERATORS_FROM_CONFIG
        from .blackbox.grumpkin import set_external_generators

        if self.pedersen_generators is not None:
            set_external_generators(self.pedersen_generators)
            _GENERATORS_FROM_CONFIG = True
        elif _GENERATORS_FROM_CONFIG:
            set_external_generators(())
            _GENERATORS_FROM_CONFIG = False

    def plan(self, circuit, input_witnesses=None):
        from .tpu.planner import plan_circuit

        self._apply_generators()
        return plan_circuit(circuit, input_witnesses, config=self)

    def make_mesh(self):
        """Build the jax.sharding.Mesh described by mesh_shape, or None."""
        if self.mesh_shape is None:
            return None
        import numpy as np
        import jax
        from jax.sharding import Mesh

        n = 1
        for d in self.mesh_shape:
            n *= d
        devices = np.asarray(jax.devices()[:n]).reshape(self.mesh_shape)
        return Mesh(devices, self.mesh_axis_names[: len(self.mesh_shape)])

    def solver(self, plan, **kwargs):
        from .tpu.batch_solver import BatchSolver

        self._apply_generators()
        kwargs.setdefault("mesh", self.make_mesh())
        return BatchSolver(plan, **kwargs)


# True while the domain-0 external generator table was installed by an
# EngineConfig (vs a direct set_external_generators call).
_GENERATORS_FROM_CONFIG = False

DEFAULT_CONFIG = EngineConfig()
