"""Multi-process launcher for the distributed solver.

The reference is a single-process library (SURVEY.md section 2.10); the TPU
build scales instance-data-parallel across hosts with ``jax.distributed``.
This module provides the launch glue:

* ``launch_local`` — spawn N ranks of a worker script on this machine with the
  coordinator env pre-wired.  With ``platform="cpu"`` each rank gets
  ``devices_per_process`` virtual CPU devices, giving a faithful local
  simulation of a multi-host pod (gloo cross-process collectives); this is how
  ``tests/test_distributed.py`` exercises the multi-host path without pod
  hardware.
* CLI: ``python -m acvm_tpu.parallel.launcher --num-processes 2 worker.py`` —
  the local analogue of one-command pod launches.

On a real TPU pod slice each host runs the worker under the pod scheduler
instead; ``distributed.initialize()`` then picks the coordinator from the TPU
environment automatically and no env wiring is needed.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
from typing import List, Optional, Sequence


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch_local(
    num_processes: int,
    argv: Sequence[str],
    *,
    platform: str = "cpu",
    devices_per_process: int = 4,
    port: Optional[int] = None,
    timeout: float = 900,
    env: Optional[dict] = None,
) -> List[subprocess.CompletedProcess]:
    """Run ``num_processes`` ranks of ``[python] argv`` as one distributed job.

    Each rank receives ACVM_TPU_COORDINATOR / ACVM_TPU_NUM_PROCESSES /
    ACVM_TPU_PROCESS_ID / ACVM_TPU_SIM_PLATFORM env vars, which
    ``distributed.initialize_from_env()`` consumes.  Returns the completed
    processes (all waited); raises if any rank exits nonzero.
    """
    port = port or _free_port()
    base_env = dict(os.environ)
    if env:
        base_env.update(env)
    if platform == "cpu":
        import re

        flags = re.sub(
            r"--xla_force_host_platform_device_count=\d+",
            "",
            base_env.get("XLA_FLAGS", ""),
        )
        base_env["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={devices_per_process}"
        ).strip()
    procs = []
    for rank in range(num_processes):
        rank_env = dict(base_env)
        rank_env.update(
            ACVM_TPU_COORDINATOR=f"localhost:{port}",
            ACVM_TPU_NUM_PROCESSES=str(num_processes),
            ACVM_TPU_PROCESS_ID=str(rank),
            ACVM_TPU_SIM_PLATFORM=platform,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, *argv],
                env=rank_env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    done = []
    failures = []
    for rank, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            failures.append((rank, "timeout", out, err))
            continue
        done.append(
            subprocess.CompletedProcess(p.args, p.returncode, out, err)
        )
        if p.returncode != 0:
            failures.append((rank, f"rc={p.returncode}", out, err))
    if failures:
        detail = "\n".join(
            f"--- rank {r} ({why})\nstdout:\n{o}\nstderr:\n{e}"
            for r, why, o, e in failures
        )
        raise RuntimeError(f"distributed launch failed:\n{detail}")
    return done


def main(args: Optional[Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser(
        description="Launch N local ranks of a distributed acvm_tpu worker."
    )
    parser.add_argument("--num-processes", type=int, default=2)
    parser.add_argument("--platform", default="cpu")
    parser.add_argument("--devices-per-process", type=int, default=4)
    parser.add_argument("worker", nargs=argparse.REMAINDER)
    ns = parser.parse_args(args)
    if not ns.worker:
        parser.error("worker script (and its args) required")
    results = launch_local(
        ns.num_processes,
        ns.worker,
        platform=ns.platform,
        devices_per_process=ns.devices_per_process,
    )
    for rank, r in enumerate(results):
        sys.stdout.write(f"--- rank {rank}\n{r.stdout}")


if __name__ == "__main__":
    main()
