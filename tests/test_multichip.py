"""Multi-chip sharding tests on a virtual 8-device CPU mesh.

The ambient sitecustomize registers the TPU plugin before pytest starts, so
these run in subprocesses that switch the platform with jax.config.update
(mirroring how the driver validates ``dryrun_multichip``).
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cpu_subprocess(body: str, timeout: int = 600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    # Share the repo's persistent compile cache across subprocess runs; the
    # jax.config.update in the preamble wins even though the ambient
    # sitecustomize imports jax before the env var is read.
    cache_dir = env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache")
    )
    code = textwrap.dedent(
        """
        import os, sys
        sys.path.insert(0, {repo!r})
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir", {cache!r})
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        assert len(jax.devices()) == 8, jax.devices()
        """
    ).format(repo=REPO, cache=cache_dir) + textwrap.dedent(body)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    return proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_8():
    out = run_cpu_subprocess(
        """
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)
        print("MULTICHIP_OK")
        """
    )
    assert "MULTICHIP_OK" in out


@pytest.mark.slow
def test_sharded_pedersen_msm():
    out = run_cpu_subprocess(
        """
        import numpy as np
        import jax, jax.numpy as jnp
        from jax.sharding import Mesh
        from acvm_tpu.blackbox.ec import grumpkin
        from acvm_tpu.blackbox.grumpkin import derive_generator
        from acvm_tpu.fields import BN254_FR
        from acvm_tpu.fields.jnp_ops import LimbContext
        from acvm_tpu.fields.limbs import ints_to_limbs, limbs_to_ints
        from acvm_tpu.tpu import ec

        ctx = LimbContext(BN254_FR)
        devices = np.asarray(jax.devices()[:2]).reshape(1, 2)
        mesh = Mesh(devices, ("data", "model"))

        n_gen, batch = 2, 3
        gens = [derive_generator(0, i) for i in range(n_gen)]
        # 8 windows cover the < 2^30 test scalars and keep CPU compiles sane
        tables = jnp.stack([ec.window_table(g, 8) for g in gens])
        rng = np.random.RandomState(3)
        scalars_int = [
            [int(rng.randint(1, 1 << 30)) for _ in range(n_gen)]
            for _ in range(batch)
        ]
        scalars = jnp.asarray(np.stack([ints_to_limbs(r) for r in scalars_int]))

        ax, ay = ec.pedersen_msm_sharded(ctx, tables, scalars, mesh)
        xs = limbs_to_ints(np.asarray(ax))
        ys = limbs_to_ints(np.asarray(ay))
        for b in range(batch):
            expected = None
            for g, s in zip(gens, scalars_int[b]):
                expected = grumpkin.add(expected, grumpkin.mul(s, g))
            assert (xs[b], ys[b]) == expected, b
        print("SHARDED_MSM_OK")
        """
    )
    assert "SHARDED_MSM_OK" in out


@pytest.mark.slow
def test_fused_engine_sharded_over_mesh():
    """Round-5: the fused rows-layout engine sharded on its S axis via
    shard_map (off-TPU the level runs the vectorized jnp twin of the Pallas
    kernel — same descriptor semantics), bit-exact vs the sequential
    engine."""
    out = run_cpu_subprocess(
        """
        import os
        os.environ["ACVM_TPU_FUSED_INTERPRET"] = "1"
        import numpy as np
        from acvm_tpu.parallel import make_mesh
        from acvm_tpu.tpu import BatchSolver, plan_circuit
        from acvm_tpu.utils import build_wide_arith_circuit, random_inputs

        circuit = build_wide_arith_circuit(
            num_inputs=16, num_levels=2, gates_per_level=128
        )
        plan = plan_circuit(circuit)
        mesh = make_mesh(jax.devices()[:4])
        solver = BatchSolver(plan, mesh=mesh)
        B = 4096
        assert solver._fused_eligible(B)
        inputs = random_inputs(circuit, B)
        res = solver.solve(inputs)
        assert res.ok.all()

        from acvm_tpu.acir import Witness, WitnessMap
        from acvm_tpu.blackbox import StubBlackBoxSolver
        from acvm_tpu.fields import FieldElement
        from acvm_tpu.pwg import ACVM, ACVMStatus

        wm = WitnessMap()
        for w, v in inputs[0].items():
            wm.insert(Witness(w), FieldElement(v))
        acvm = ACVM(StubBlackBoxSolver(), circuit.opcodes, wm)
        assert acvm.solve() == ACVMStatus.SOLVED
        last = circuit.current_witness_index
        assert res.witness_ints(last)[0] == int(
            acvm.finalize().get(Witness(last))
        )
        print("FUSED_MESH_OK")
        """
    )
    assert "FUSED_MESH_OK" in out
