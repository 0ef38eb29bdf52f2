"""ACIR fallback circuit builders (reference crate: stdlib).

Circuit *generators*: every function takes input expressions plus the current
witness counter and returns (updated_witness_count, opcodes) implementing the
gadget in arithmetic gates + Brillig hints.
"""

from .helpers import VariableStore
from .logic_fallbacks import and_fallback, range_fallback, xor_fallback
from .uint import (
    UIntGadget,
    uint8,
    uint32,
    uint32_from_witnesses,
    uint64,
    uint64_from_witnesses,
)

# Convenience aliases matching the reference's public names.
and_ = and_fallback
xor = xor_fallback
range_ = range_fallback


def sha256(*args, **kwargs):
    from .sha256 import sha256 as _sha256

    return _sha256(*args, **kwargs)


def blake2s(*args, **kwargs):
    from .blake2s import blake2s as _blake2s

    return _blake2s(*args, **kwargs)


def keccak256(*args, **kwargs):
    from .keccak256 import keccak256 as _keccak256

    return _keccak256(*args, **kwargs)


def hash_to_field(*args, **kwargs):
    from .hash_to_field import hash_to_field as _hash_to_field

    return _hash_to_field(*args, **kwargs)


__all__ = [
    "VariableStore",
    "UIntGadget",
    "uint8",
    "uint32",
    "uint64",
    "uint32_from_witnesses",
    "uint64_from_witnesses",
    "and_fallback",
    "xor_fallback",
    "range_fallback",
    "sha256",
    "blake2s",
    "keccak256",
    "hash_to_field",
]
