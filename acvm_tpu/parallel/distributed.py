"""Multi-host launch glue (the reference has no distributed runtime; SURVEY.md
section 5 maps "distributed communication backend" to JAX collectives over
ICI/DCN).

Usage on each host of a pod slice::

    from acvm_tpu.parallel import distributed
    distributed.initialize()                  # jax.distributed, env-driven
    mesh = distributed.global_mesh()          # (data,) over every chip
    solver = BatchSolver(plan, mesh=mesh)
    result = solver.solve(my_shard_of_inputs)

Instances are embarrassingly parallel, so the only cross-host traffic is
XLA-managed resharding of inputs/outputs; gadget-level collectives (EC bucket
sums) will ride the same mesh when they land.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from .mesh import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed; arguments default to the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars or
    the TPU pod auto-detection."""
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = coordinator_address or os.environ.get(
            "JAX_COORDINATOR_ADDRESS"
        )
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"]
        )
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None else os.environ["JAX_PROCESS_ID"]
        )
    jax.distributed.initialize(**kwargs)


def initialize_from_env() -> None:
    """Initialize this process as one rank of a job spawned by
    ``launcher.launch_local`` (ACVM_TPU_* env vars).  With
    ``ACVM_TPU_SIM_PLATFORM=cpu`` the rank switches to the virtual-CPU
    platform and gloo cross-process collectives first — the local simulation
    of a multi-host pod used by tests/test_distributed.py."""
    platform = os.environ.get("ACVM_TPU_SIM_PLATFORM")
    if platform and "axon" not in platform:
        # The ambient sitecustomize registers the TPU plugin before user code
        # runs, so the platform must be switched through jax.config.
        jax.config.update("jax_platforms", platform)
        if platform == "cpu":
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    initialize(
        coordinator_address=os.environ["ACVM_TPU_COORDINATOR"],
        num_processes=int(os.environ["ACVM_TPU_NUM_PROCESSES"]),
        process_id=int(os.environ["ACVM_TPU_PROCESS_ID"]),
    )


def global_mesh(axis_name: str = "data"):
    """A 1-D mesh over every device in the (possibly multi-host) job."""
    return make_mesh(jax.devices(), axis_name)


def process_batch_slice(total_batch: int) -> slice:
    """The contiguous slice of a global batch owned by this process."""
    n = jax.process_count()
    i = jax.process_index()
    per = (total_batch + n - 1) // n
    return slice(i * per, min((i + 1) * per, total_batch))
