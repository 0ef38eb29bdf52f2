"""acvm_tpu — a TPU-native ACIR witness-generation engine.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
noir-lang/acvm: the ACIR IR and wire format, the ACVM partial-witness-generation
engine, the Brillig unconstrained VM, black-box gadget solvers (hashes, logic,
EC over Grumpkin, ECDSA), the backend-targeting compiler passes, and — the point
of the exercise — a batched data-parallel solver that executes thousands of
circuit instances per step across a TPU mesh.
"""

__version__ = "0.1.0"

from .fields import FieldElement
from .acir import Circuit, Expression, Witness, WitnessMap
