#!/usr/bin/env python
"""Headline benchmark: witnesses solved/sec/chip on a 2^16-gate BN254 circuit.

Solves a batch of independent instances of a 65,536-gate arithmetic circuit
with the TPU batched engine and reports witness-solve throughput per chip.
``vs_baseline`` compares against the sequential host engine solving the same
circuit one instance at a time (the reference publishes no numbers of its own —
see BASELINE.md).

Resilience: if the requested batch exhausts HBM the benchmark halves the batch
and retries (the driver must always capture a number).  The solve step donates
its witness buffer, so the timed loop chains state through the jit without
holding two full panels live.

Also reports the Montgomery-multiply microbenchmark against the documented
per-chip roofline (see BASELINE.md "Roofline"): ``montmul_per_sec`` and
``roofline_pct``.

Every *extra* metric (gadget throughput, dynamic-denominator path, 1-device
mesh overhead) runs in a FRESH SUBPROCESS (``python bench.py --extra NAME``):
round 3 lost 4 of 6 extras to runtime-state degradation inside one long-lived
process (INVALID_ARGUMENT after workload switches); process isolation plus the
persistent compile cache makes each extra independent and cheap.

Timing discipline: every timed region ends in a host readback (`benchtime.sync`
— block_until_ready lies on this runtime) and is converted to a rate by
`benchtime.timed_rate`, which subtracts one measured RTT and *refuses* to
report RTT-dominated measurements — the harness then doubles the chained work
and retries instead of clamping (the round-3 clamp could inflate rates).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Environment knobs: BENCH_BATCH (default 2048), BENCH_LEVELS (8),
BENCH_GATES_PER_LEVEL (8192), BENCH_MIN_BATCH (8), BENCH_EXTRAS (=0 to skip),
BENCH_EXTRA_TIMEOUT (seconds per extra subprocess, default 900).
"""

import json
import os
import subprocess
import sys
import time

# Speed-of-light estimate for the 16x16-limb CIOS Montgomery multiply on one
# TPU v5e chip.  Round-3 RTT-amortized re-measurement (benchmarks/
# vpu_rates.py) confirms the VPU sustains ~6.1e12 lane-ops/s on the CIOS
# instruction mix; ~2,800 lane-ops per reduced multiply => 2.18e9/s.  See
# BASELINE.md "Roofline (round-3 final)".
MONTMUL_ROOFLINE_PER_SEC = 2.18e9
# Round-2 documented figure (2,950-op count at the same peak), kept for
# cross-round comparability.
MONTMUL_ROOFLINE_R2_DOCUMENTED = 2.05e9

EXTRA_NAMES = [
    "sha256_solves_per_sec",
    "keccak256_solves_per_sec",
    "pedersen_solves_per_sec",
    "schnorr_solves_per_sec",
    "ecdsa_k1_solves_per_sec",
    "fixed_base_solves_per_sec",
    "dyn_solves_per_sec",
    "mesh1_overhead_pct",
    "b10k_solves_per_sec",
]


def _is_oom(err: BaseException) -> bool:
    """Errors worth retrying at a smaller batch.  Besides the runtime
    RESOURCE_EXHAUSTED, the remote compile service surfaces compile-time HBM
    exhaustion as an opaque INTERNAL/HTTP-500 error (the 'Ran out of memory in
    memory space hbm' detail only reaches the service log) — treat those as
    retryable too; a genuine bug would still fail at min_batch."""
    s = str(err)
    return (
        "RESOURCE_EXHAUSTED" in s
        or "Resource exhausted" in s
        or "Ran out of memory" in s
        or "remote_compile" in s
        or "HTTP 500" in s
    )


def _sync(x):
    from acvm_tpu.utils.benchtime import sync

    sync(x)


def _rtt() -> float:
    from acvm_tpu.utils.benchtime import measure_rtt

    return measure_rtt()


def _rate_or_retry(run_once, work_per_iter: float, iters: int = 4,
                   max_doublings: int = 6):
    """Best-of-3 guarded rate: chains ``iters`` calls of ``run_once`` per
    sync; when the measurement is RTT-dominated, doubles the chain length and
    retries instead of clamping."""
    from acvm_tpu.utils.benchtime import timed_rate

    rtt = _rtt()
    for _ in range(max_doublings):
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = run_once()
            if out is not None:
                _sync(out)
            rate = timed_rate(
                work_per_iter * iters, time.perf_counter() - t0, rtt
            )
            if rate is None:
                rates = None
                break
            rates.append(rate)
        if rates:
            return max(rates)
        iters *= 2
    raise RuntimeError(
        "measurement stayed RTT-dominated after chaining "
        f"{iters} iterations — refusing to report a tunnel number"
    )


def _bench_montmul(iters: int = 256, n: int = 1 << 20):
    """Achieved Montgomery multiplies/sec on the unrolled-limb (v2) Pallas
    kernel in its native vreg-tile layout (the layout the fused solve kernel
    uses internally)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from acvm_tpu.fields.params import NUM_LIMBS, LIMB_BITS
    from acvm_tpu.fields.pallas_mul_v2 import mont_mul_tiled, to_tiled

    rng = np.random.default_rng(42)
    a = rng.integers(0, 1 << LIMB_BITS, size=(n, NUM_LIMBS), dtype=np.uint32)
    a[:, -1] &= 0x0FFF  # keep < p
    b = rng.integers(0, 1 << LIMB_BITS, size=(n, NUM_LIMBS), dtype=np.uint32)
    b[:, -1] &= 0x0FFF

    at, _ = to_tiled(jnp.asarray(a))
    bt, _ = to_tiled(jnp.asarray(b))
    # Chain a*b -> a so the timed region is pure kernel work (donated input).
    step = jax.jit(lambda x, y: mont_mul_tiled(x, y), donate_argnums=(0,))
    x = step(at, bt)
    _sync(x)

    state = {"x": x}

    def once():
        state["x"] = step(state["x"], bt)
        return state["x"]

    return _rate_or_retry(once, n, iters=iters)


def _solve_throughput(batch: int, levels: int, gates_per_level: int):
    """(witness_solves_per_sec, seq_per_sec). Raises on OOM."""
    import jax
    import numpy as np

    from acvm_tpu.tpu import BatchSolver, plan_circuit
    from acvm_tpu.utils import build_wide_arith_circuit, random_inputs

    num_gates = levels * gates_per_level
    circuit = build_wide_arith_circuit(
        num_levels=levels, gates_per_level=gates_per_level
    )
    plan = plan_circuit(circuit)
    solver = BatchSolver(plan)
    inputs = random_inputs(circuit, batch)

    state = solver.initial_state(inputs)
    # Donate the witness panel: the timed loop chains state through the jit so
    # only one full witness-panel buffer is live at a time.
    fn = jax.jit(solver._segment_fn(0), donate_argnums=(0,))

    # Warm up / compile.
    W, ok, fail, mem = fn(*state)
    _sync(W)
    assert bool(ok.all()), "benchmark circuit must be satisfiable"

    # Correctness spot-check: final witness of instance 0 vs the sequential
    # engine (the bench must never report a fast-but-wrong number).
    from acvm_tpu.acir import Witness, WitnessMap
    from acvm_tpu.blackbox import StubBlackBoxSolver
    from acvm_tpu.fields import FieldElement
    from acvm_tpu.pwg import ACVM, ACVMStatus
    from acvm_tpu.tpu.batch_solver import BatchResult

    wm = WitnessMap()
    for w, v in inputs[0].items():
        wm.insert(Witness(w), FieldElement(v))
    acvm = ACVM(StubBlackBoxSolver(), circuit.opcodes, wm)
    seq_t0 = time.perf_counter()
    assert acvm.solve() == ACVMStatus.SOLVED
    seq_elapsed = time.perf_counter() - seq_t0
    expected = acvm.finalize()
    last = circuit.current_witness_index
    # keep W on device: BatchResult reads one witness ROW, not the panel
    got = BatchResult(solver, W, np.asarray(ok)).witness_ints(last)[0]
    assert got == int(expected.get(Witness(last))), "device result mismatch"
    del acvm, expected, wm

    # Timed runs: chain state through the donated jit; solving an already-
    # solved panel recomputes the identical values, so each run is the same
    # work as the first.
    state = {"s": (W, ok, fail, mem)}

    def once():
        state["s"] = fn(*state["s"])
        return state["s"][0]

    wps = _rate_or_retry(once, batch * num_gates)
    return wps, num_gates / seq_elapsed


def _gadget_throughput(kind: str, batch: int, num_gadgets: int, msg_len: int):
    """gadget solves/sec through the public ``BatchSolver.solve`` API
    (columnar inputs), with an instance-0 cross-check against the sequential
    engine."""
    from acvm_tpu.tpu import BatchSolver, plan_circuit
    from acvm_tpu.utils import (
        build_gadget_circuit,
        columnar_instance,
        gadget_inputs_columnar,
    )

    circuit = build_gadget_circuit(kind, num_gadgets=num_gadgets, msg_len=msg_len)
    solver = BatchSolver(plan_circuit(circuit))
    # Byte-message hash kinds use device-resident columns (the
    # upstream-on-device production pattern): the tunneled runtime's
    # ~34 MB/s host->device upload otherwise dominates and measures the
    # link, not the engine.
    if kind in ("sha256", "blake2s", "keccak256"):
        import jax.numpy as jnp
        import numpy as _np0

        witnesses = sorted(
            int(w) for w in circuit.circuit_arguments()
        )
        rng0 = _np0.random.default_rng(7)
        matrix = jnp.asarray(rng0.integers(
            0, 256, size=(batch, len(witnesses)), dtype=_np0.uint8
        ))
        inputs = (witnesses, matrix)  # packed device-resident matrix
    else:
        inputs = gadget_inputs_columnar(circuit, batch, kind)
    res = solver.solve(inputs)  # compile + correctness flags
    assert bool(res.ok.all()), f"{kind} gadget bench unsatisfiable"

    # Sequential cross-check on instance 0 (never report fast-but-wrong).
    from acvm_tpu.acir import Witness, WitnessMap
    from acvm_tpu.blackbox import GrumpkinSolver
    from acvm_tpu.fields import FieldElement
    from acvm_tpu.pwg import ACVM, ACVMStatus

    import numpy as _np

    if isinstance(inputs, tuple):
        row0 = _np.asarray(inputs[1][0])
        first = {w: int(v) for w, v in zip(inputs[0], row0)}
    else:
        first = columnar_instance(
            {w: _np.asarray(a) for w, a in inputs.items()}, 0
        )
    wm = WitnessMap()
    for w, v in first.items():
        wm.insert(Witness(w), FieldElement(v))
    acvm = ACVM(GrumpkinSolver(), circuit.opcodes, wm)
    assert acvm.solve() == ACVMStatus.SOLVED
    expected = acvm.finalize()
    last = circuit.current_witness_index
    assert res.witness_ints(last)[0] == int(expected.get(Witness(last)))

    # Timed: the full public path per call — columnar packing, device solve,
    # per-instance ok-flag readback (solve materializes ok/fail; the witness
    # panel stays on device).  One RTT per call is subtracted by timed_rate;
    # the guard refuses RTT-dominated results instead of clamping.
    def once():
        out = solver.solve(inputs)
        assert bool(out.ok.all())
        return None  # solve already synced via its ok readback

    return _rate_or_retry(once, batch * num_gadgets, iters=1)


def _dyn_throughput(batch: int, levels: int, gates_per_level: int):
    """witness solves/sec on a circuit whose gates carry dynamic (runtime)
    denominators, exercising the batched-inversion path; asserts the batch
    trick actually traced."""
    import jax
    from acvm_tpu.fields import jnp_ops
    from acvm_tpu.tpu import BatchSolver, plan_circuit
    from acvm_tpu.utils import build_wide_arith_circuit, random_inputs

    circuit = build_wide_arith_circuit(
        num_levels=levels, gates_per_level=gates_per_level, dyn_fraction=0.5
    )
    plan = plan_circuit(circuit)
    solver = BatchSolver(plan)
    inputs = random_inputs(circuit, batch)
    state = solver.initial_state(inputs)
    fn = jax.jit(solver._segment_fn(0), donate_argnums=(0,))
    before = jnp_ops.BATCH_INV_TRACES
    W, ok, fail, mem = fn(*state)
    _sync(W)
    assert bool(ok.all()), "dyn bench circuit must be satisfiable"
    assert jnp_ops.BATCH_INV_TRACES > before, (
        "dynamic-denominator solve did not trace mont_batch_inv"
    )
    state = {"s": (W, ok, fail, mem)}

    def once():
        state["s"] = fn(*state["s"])
        return state["s"][0]

    return _rate_or_retry(once, batch * levels * gates_per_level)


def _b10k_throughput():
    """North-star shape (BASELINE.json): 10,240 instances of the 2^16-gate
    circuit streamed through HBM-sized passes (solve_chunks) on one chip —
    end-to-end through the public solve API, packing included, every
    instance's ok flag checked."""
    import time as _time

    from acvm_tpu.tpu import BatchSolver, plan_circuit
    from acvm_tpu.utils import build_wide_arith_circuit, random_inputs

    B = 10240
    levels, gpl = 8, 8192
    circuit = build_wide_arith_circuit(num_levels=levels, gates_per_level=gpl)
    solver = BatchSolver(plan_circuit(circuit))
    inputs = random_inputs(circuit, B)
    # warm-up/compile on one chunk
    chunk = solver.max_batch_per_pass()
    solver.solve(inputs[:chunk])
    # Aggregate solve: BatchSolver._solve_streamed double-buffers the stream
    # (chunk k+1's host packing on a prefetch thread while chunk k solves;
    # flag readbacks drained only after the next chunk's device work is
    # enqueued).
    t0 = _time.perf_counter()
    result = solver.solve(inputs)
    elapsed = _time.perf_counter() - t0
    assert bool(result.ok.all()) and result.ok.shape[0] == B
    # Multi-second end-to-end run: the per-pass RTTs are part of the real
    # cost here, so no RTT subtraction.
    return B * levels * gpl / elapsed


def _mesh1_overhead(batch: int, levels: int, gates_per_level: int):
    """Sharding-machinery cost without multi-chip hardware: the same solve
    through a 1-device jax.sharding.Mesh vs the plain path (BASELINE.json
    configs 4-5 need the machinery; this measures its single-chip tax).

    Round 5: BOTH sides run the fused rows-layout engine — sharded solves now
    shard the witness-major panel on its S axis and run the fused kernel
    per-shard under shard_map, so this measures the shard_map tax on the
    production engine."""
    import jax

    from acvm_tpu.parallel import make_mesh
    from acvm_tpu.tpu import BatchSolver, plan_circuit
    from acvm_tpu.utils import build_wide_arith_circuit, random_inputs

    circuit = build_wide_arith_circuit(
        num_levels=levels, gates_per_level=gates_per_level
    )
    plan = plan_circuit(circuit)
    inputs = random_inputs(circuit, batch)

    def timed(solver):
        state = solver.initial_state(inputs)
        fn = jax.jit(solver._segment_fn(0), donate_argnums=(0,))
        W, ok, fail, mem = fn(*state)
        _sync(W)
        assert bool(ok.all())
        st = {"s": (W, ok, fail, mem)}

        def once():
            st["s"] = fn(*st["s"])
            return st["s"][0]

        # rate in solves/sec; overhead computed from the two rates
        return _rate_or_retry(once, batch * levels * gates_per_level)

    plain = timed(BatchSolver(plan))
    mesh = make_mesh(jax.devices()[:1])
    sharded = timed(BatchSolver(plan, mesh=mesh))
    return 100.0 * (plain - sharded) / sharded


def _setup_jax():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

    import jax

    # sitecustomize imports jax before us, so env vars alone are too late.
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


def _run_extra(name: str, batch: int):
    # Hash gadget batches are large: the per-call overhead (one RTT for the
    # ok-flag readback + columnar packing) amortizes over B*G gadget solves,
    # and the panel at B=8192 is ~2.3 GB — well inside HBM.
    gbatch = int(os.environ.get("BENCH_GADGET_BATCH", "8192"))
    if name == "sha256_solves_per_sec":
        return _gadget_throughput("sha256", gbatch, 8, 64)
    if name == "keccak256_solves_per_sec":
        return _gadget_throughput("keccak256", gbatch, 8, 64)
    if name == "pedersen_solves_per_sec":
        # Round-5 tree-reduced MSM: log2(n*64) wide pt_add rounds instead of
        # the sequential 64-step window scan; batch raised accordingly.
        return _gadget_throughput("pedersen", min(gbatch, 2048), 2, 0)
    if name == "schnorr_solves_per_sec":
        # Cost model (BASELINE.md "EC gadget cost models"): dominated by the
        # 256-round variable-base e*P ladder (~6.6k montmuls/instance).
        # B = 1024 engages the fused-kernel ladder (ec_pallas.scalar_mul_fused
        # needs the batch to be a multiple of 1024).
        return _gadget_throughput("schnorr", 1024, 2, 32)
    if name == "ecdsa_k1_solves_per_sec":
        return _gadget_throughput("ecdsa_k1", 256, 2, 0)
    if name == "fixed_base_solves_per_sec":
        return _gadget_throughput("fixed_base", min(gbatch, 4096), 4, 0)
    if name == "dyn_solves_per_sec":
        return _dyn_throughput(batch, 4, 4096)
    if name == "mesh1_overhead_pct":
        return _mesh1_overhead(batch, 2, 4096)
    if name == "b10k_solves_per_sec":
        return _b10k_throughput()
    raise ValueError(name)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "2048"))
    min_batch = int(os.environ.get("BENCH_MIN_BATCH", "8"))
    levels = int(os.environ.get("BENCH_LEVELS", "8"))
    gates_per_level = int(os.environ.get("BENCH_GATES_PER_LEVEL", "8192"))

    _setup_jax()

    if len(sys.argv) >= 3 and sys.argv[1] == "--extra":
        # Child mode: compute one extra, print one JSON object.
        name = sys.argv[2]
        value = _run_extra(name, batch)
        print(json.dumps({"name": name, "value": round(value, 2)}))
        return

    # OOM-resilient headline measurement: halve the batch until it fits.
    result = None
    while True:
        try:
            wps, seq_per_sec = _solve_throughput(batch, levels, gates_per_level)
            result = (wps, seq_per_sec, batch)
            break
        except Exception as err:  # noqa: BLE001 - only OOM is retried
            if _is_oom(err) and batch > min_batch:
                print(
                    f"bench: batch {batch} exhausted HBM; retrying at "
                    f"{batch // 2}",
                    file=sys.stderr,
                )
                batch //= 2
                continue
            raise

    wps, seq_per_sec, batch_used = result

    try:
        montmul_per_sec = _bench_montmul()
    except Exception as err:  # noqa: BLE001 - microbench must not kill the run
        print(f"bench: montmul microbench failed: {err}", file=sys.stderr)
        montmul_per_sec = None

    out = {
        "metric": "witness_solves_per_sec_per_chip_2e16_gate_bn254",
        "value": round(wps, 2),
        "unit": "witness solves/s/chip",
        "vs_baseline": round(wps / seq_per_sec, 3),
        "batch": batch_used,
        "seq_baseline_per_sec": round(seq_per_sec, 2),
    }
    if montmul_per_sec is not None:
        out["montmul_per_sec"] = round(montmul_per_sec, 2)
        out["montmul_roofline_per_sec"] = MONTMUL_ROOFLINE_PER_SEC
        out["roofline_pct"] = round(
            100.0 * montmul_per_sec / MONTMUL_ROOFLINE_PER_SEC, 2
        )
        # Against the (unreachable, see BASELINE.md) round-2 documented figure
        # for cross-round comparability.
        out["roofline_pct_vs_r2_documented"] = round(
            100.0 * montmul_per_sec / MONTMUL_ROOFLINE_R2_DOCUMENTED, 2
        )

    # Extras: each one runs in a FRESH subprocess (see module docstring); a
    # failure/timeout records None and never kills the headline.  Skip all
    # with BENCH_EXTRAS=0.
    if os.environ.get("BENCH_EXTRAS", "1") != "0":
        extra_timeout = float(os.environ.get("BENCH_EXTRA_TIMEOUT", "900"))
        env = dict(os.environ, BENCH_BATCH=str(batch_used))
        for name in EXTRA_NAMES:
            out[name] = None
            for attempt in range(2):
                try:
                    proc = subprocess.run(
                        [sys.executable, os.path.abspath(__file__),
                         "--extra", name],
                        capture_output=True, text=True, timeout=extra_timeout,
                        env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
                    )
                    if proc.returncode == 0:
                        payload = json.loads(proc.stdout.strip().splitlines()[-1])
                        out[name] = payload["value"]
                        break
                    tail = (proc.stderr or "").strip().splitlines()[-3:]
                    print(
                        f"bench: {name} extra failed (try {attempt}, "
                        f"rc={proc.returncode}): {' | '.join(tail)}",
                        file=sys.stderr,
                    )
                except subprocess.TimeoutExpired:
                    print(
                        f"bench: {name} extra timed out (try {attempt})",
                        file=sys.stderr,
                    )
                except Exception as err:  # noqa: BLE001
                    print(
                        f"bench: {name} extra failed (try {attempt}): {err}",
                        file=sys.stderr,
                    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
