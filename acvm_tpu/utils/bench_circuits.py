"""Synthetic ACIR circuits for benchmarking and smoke tests.

The headline benchmark (BASELINE.json "metric") solves a 2^16-gate BN254
arithmetic circuit over large instance batches.  The generator below emits a
wide layered circuit: ``num_levels`` dependency levels of ``gates_per_level``
arithmetic gates, each solving one fresh witness from two random
already-known witnesses (with a slice of witness*witness mul terms to exercise
the quadratic path).
"""

from __future__ import annotations

import random
from typing import Dict, List

from ..acir import Circuit, Expression, Witness
from ..acir import opcodes as ops
from ..fields.field import FieldElement
from ..fields.params import BN254_FR


def build_wide_arith_circuit(
    num_inputs: int = 128,
    num_levels: int = 8,
    gates_per_level: int = 8192,
    mul_fraction: float = 0.25,
    dyn_fraction: float = 0.0,
    seed: int = 1234,
) -> Circuit:
    rng = random.Random(seed)
    p = BN254_FR.modulus
    opcodes: List[ops.Opcode] = []

    inputs = [Witness(i + 1) for i in range(num_inputs)]
    known = list(inputs)
    next_witness = num_inputs + 1

    for _ in range(num_levels):
        level_known = list(known)
        new_witnesses = []
        for g in range(gates_per_level):
            x = level_known[rng.randrange(len(level_known))]
            y = level_known[rng.randrange(len(level_known))]
            out = Witness(next_witness)
            next_witness += 1
            c1 = FieldElement(rng.randrange(1, p))
            c0 = FieldElement(rng.randrange(p))
            if rng.random() < dyn_fraction:
                # qm*x*out + c1*x + c0 = 0: the solved witness carries a
                # NON-CONSTANT coefficient (den = qm*x), forcing the batched
                # modular-inversion path (arithmetic.rs:27-127 division by a
                # runtime value; `run_arith_solve_dyn` + `mont_batch_inv`).
                qm = FieldElement(rng.randrange(1, p))
                expr = Expression(
                    mul_terms=[(qm, min(x, out), max(x, out))],
                    linear_combinations=[(c1, x)],
                    q_c=c0,
                )
                opcodes.append(ops.OpcodeArithmetic(expr))
                new_witnesses.append(out)
                continue
            if rng.random() < mul_fraction:
                # qm*x*y + c1*x + c0 - out = 0
                qm = FieldElement(rng.randrange(1, p))
                expr = Expression(
                    mul_terms=[(qm, min(x, y), max(x, y))],
                    linear_combinations=[(c1, x), (-FieldElement.one(), out)],
                    q_c=c0,
                )
            else:
                c2 = FieldElement(rng.randrange(1, p))
                expr = Expression(
                    linear_combinations=[
                        (c1, x),
                        (c2, y),
                        (-FieldElement.one(), out),
                    ],
                    q_c=c0,
                )
            opcodes.append(ops.OpcodeArithmetic(expr))
            new_witnesses.append(out)
        known.extend(new_witnesses)

    return Circuit(
        current_witness_index=next_witness - 1,
        opcodes=opcodes,
        private_parameters=set(inputs),
    )


def random_inputs(
    circuit: Circuit, batch: int, seed: int = 99
) -> List[Dict[int, int]]:
    rng = random.Random(seed)
    p = BN254_FR.modulus
    witnesses = sorted(int(w) for w in circuit.circuit_arguments())
    return [
        {w: rng.randrange(p) for w in witnesses} for _ in range(batch)
    ]


def build_gadget_circuit(
    kind: str, num_gadgets: int = 8, msg_len: int = 64
) -> Circuit:
    """A circuit of ``num_gadgets`` independent black-box gadget calls, for
    gadget-throughput benchmarking (BASELINE.json north star covers gadget
    batches, not just arithmetic gates).

    kinds: "sha256" / "blake2s" / "keccak256" (per gadget: ``msg_len``
    byte-witness inputs -> 32 byte-witness outputs) and "pedersen"
    (2 field inputs -> commitment point x, y).
    """
    opcodes: List[ops.Opcode] = []
    next_witness = 1
    input_witnesses: List[Witness] = []

    def fresh() -> Witness:
        nonlocal next_witness
        w = Witness(next_witness)
        next_witness += 1
        return w

    for _ in range(num_gadgets):
        if kind == "pedersen":
            ins = [fresh(), fresh()]
            input_witnesses.extend(ins)
            outs = (fresh(), fresh())
            call = ops.BBPedersen(
                inputs=[ops.FunctionInput(w, 254) for w in ins],
                domain_separator=0,
                outputs=outs,
            )
        else:
            ins = [fresh() for _ in range(msg_len)]
            input_witnesses.extend(ins)
            outs = [fresh() for _ in range(32)]
            cls = {
                "sha256": ops.BBSha256,
                "blake2s": ops.BBBlake2s,
                "keccak256": ops.BBKeccak256,
            }[kind]
            call = cls(
                inputs=[ops.FunctionInput(w, 8) for w in ins],
                outputs=outs,
            )
        opcodes.append(ops.OpcodeBlackBoxFuncCall(call))

    return Circuit(
        current_witness_index=next_witness - 1,
        opcodes=opcodes,
        private_parameters=set(input_witnesses),
    )


def gadget_inputs(
    circuit: Circuit, batch: int, kind: str, seed: int = 7
) -> List[Dict[int, int]]:
    """Random per-instance inputs for :func:`build_gadget_circuit` (byte
    values for hash messages, field values for pedersen)."""
    rng = random.Random(seed)
    p = BN254_FR.modulus
    hi = p if kind == "pedersen" else 256
    witnesses = sorted(int(w) for w in circuit.circuit_arguments())
    return [{w: rng.randrange(hi) for w in witnesses} for _ in range(batch)]


def gadget_inputs_columnar(
    circuit: Circuit, batch: int, kind: str, seed: int = 7,
    device: bool = False,
):
    """Columnar ``{witness: (B,) array}`` form of :func:`gadget_inputs` — the
    zero-copy ingest path of ``BatchSolver.initial_state``.  Byte messages
    come back as uint8 arrays; pedersen field scalars as object arrays.

    ``device=True`` returns device-resident jax arrays for the byte kinds
    (the upstream-on-device production pattern: no host->device upload)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    witnesses = sorted(int(w) for w in circuit.circuit_arguments())
    if kind == "pedersen":
        p = BN254_FR.modulus
        pyrng = random.Random(seed)
        return {
            w: np.array(
                [pyrng.randrange(p) for _ in range(batch)], dtype=object
            )
            for w in witnesses
        }
    cols = {
        w: rng.integers(0, 256, size=batch, dtype=np.uint8) for w in witnesses
    }
    if device:
        import jax.numpy as jnp

        # One bulk upload, then device-resident column views.
        stacked = jnp.asarray(np.stack(list(cols.values()), axis=1))
        return {w: stacked[:, i] for i, w in enumerate(cols)}
    return cols


def columnar_instance(columnar, index: int) -> Dict[int, int]:
    """Extract one instance from columnar inputs as a {witness: int} dict."""
    return {w: int(a[index]) for w, a in columnar.items()}
