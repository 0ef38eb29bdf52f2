"""One rank of the multi-host solve simulation (spawned by
``acvm_tpu.parallel.launcher.launch_local`` from tests/test_distributed.py).

Every rank builds the same global batch deterministically; the solver shards
it over the global (multi-process) mesh, XLA+gloo handle the cross-process
movement, and each rank verifies the gathered result bit-for-bat against the
sequential engine — the multi-host analogue of the single-chip differential
tests.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from acvm_tpu.parallel import distributed  # noqa: E402


def main() -> None:
    distributed.initialize_from_env()
    import jax

    num = int(os.environ["ACVM_TPU_NUM_PROCESSES"])
    assert jax.process_count() == num, jax.process_count()
    assert jax.device_count() == 4 * num, jax.device_count()

    from acvm_tpu.acir import Witness, WitnessMap
    from acvm_tpu.blackbox import StubBlackBoxSolver
    from acvm_tpu.fields import FieldElement
    from acvm_tpu.pwg import ACVM, ACVMStatus
    from acvm_tpu.tpu import BatchSolver, plan_circuit
    from acvm_tpu.utils import build_wide_arith_circuit, random_inputs

    circuit = build_wide_arith_circuit(
        num_inputs=8, num_levels=2, gates_per_level=16
    )
    plan = plan_circuit(circuit)
    mesh = distributed.global_mesh()
    solver = BatchSolver(plan, mesh=mesh)

    batch = 16
    inputs = random_inputs(circuit, batch=batch)  # deterministic on all ranks
    my_slice = distributed.process_batch_slice(batch)
    assert my_slice.stop - my_slice.start == batch // num

    result = solver.solve(inputs)
    assert result.ok.all(), "distributed solve must satisfy the circuit"
    assert result.W.shape[0] == batch  # gathered: every rank sees the batch

    # Bit-exact cross-check of one instance from the *other* rank's shard.
    check = batch - 1 if jax.process_index() == 0 else 0
    wm = WitnessMap()
    for w, v in inputs[check].items():
        wm.insert(Witness(w), FieldElement(v))
    acvm = ACVM(StubBlackBoxSolver(), circuit.opcodes, wm)
    assert acvm.solve() == ACVMStatus.SOLVED
    last = circuit.current_witness_index
    assert result.witness_ints(last)[check] == int(
        acvm.finalize().get(Witness(last))
    ), "multi-host result must match the sequential engine bit-for-bit"

    print(f"DISTRIBUTED_OK rank={jax.process_index()}", flush=True)


if __name__ == "__main__":
    main()
