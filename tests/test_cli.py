"""CLI smoke tests over the golden addition circuit."""

import json
import os

import pytest

from acvm_tpu import cli

import golden_vectors as gv


@pytest.fixture
def circuit_file(tmp_path):
    path = tmp_path / "addition.acir.gz"
    path.write_bytes(gv.ADDITION_CIRCUIT)
    return str(path)


def test_info(circuit_file, capsys):
    cli.main(["info", "--circuit", circuit_file])
    out = json.loads(capsys.readouterr().out)
    assert out["opcodes"] == 1
    assert out["kinds"] == {"arithmetic": 1}
    assert out["return_values"] == [3]


def test_execute_json(circuit_file, capsys):
    cli.main(
        [
            "execute",
            "--circuit",
            circuit_file,
            "--witness-json",
            '{"1": 1, "2": "0x02"}',
        ]
    )
    out = json.loads(capsys.readouterr().out)
    assert int(out["3"], 16) == 3


def test_execute_witness_file_roundtrip(circuit_file, tmp_path, capsys):
    from acvm_tpu.acir import Witness, WitnessMap
    from acvm_tpu.acir.serialization import compress_witness, decompress_witness
    from acvm_tpu.fields import FieldElement

    wm = WitnessMap()
    wm.insert(Witness(1), FieldElement(5))
    wm.insert(Witness(2), FieldElement(7))
    win = tmp_path / "in.gz"
    win.write_bytes(compress_witness(wm))
    wout = tmp_path / "out.gz"
    cli.main(
        [
            "execute",
            "--circuit",
            circuit_file,
            "--witness",
            str(win),
            "--output",
            str(wout),
        ]
    )
    solved = decompress_witness(wout.read_bytes())
    assert solved.get(Witness(3)) == FieldElement(12)


def test_compile(circuit_file, tmp_path, capsys):
    out_path = tmp_path / "compiled.gz"
    cli.main(
        ["compile", "--circuit", circuit_file, "--width", "3", "--output", str(out_path)]
    )
    out = json.loads(capsys.readouterr().out)
    assert out["opcodes_out"] >= 1
    assert out_path.exists()


def test_solve_batched(circuit_file, capsys):
    cli.main(
        [
            "solve",
            "--circuit",
            circuit_file,
            "--witness-json",
            '{"1": 1, "2": 2}',
            "--batch",
            "4",
        ]
    )
    out = json.loads(capsys.readouterr().out)
    assert out["satisfied"] == 4


def test_log_level(circuit_file, capsys, caplog):
    """--log-level INFO surfaces the solver's plan log (initLogLevel analogue,
    acvm_js/src/logging.rs)."""
    import logging

    from acvm_tpu.utils.logging import _LEVELS, init_log_level

    cli.main(["--log-level", "INFO", "info", "--circuit", circuit_file])
    assert logging.getLogger("acvm_tpu").level == logging.INFO

    # Unknown level falls back to ERROR (reference: Level::from_str unwrap_or).
    init_log_level("bogus")
    assert logging.getLogger("acvm_tpu").level == logging.ERROR
    init_log_level("trace")
    assert logging.getLogger("acvm_tpu").level == _LEVELS["TRACE"]
    init_log_level("OFF")
    assert logging.getLogger("acvm_tpu").level > logging.CRITICAL
