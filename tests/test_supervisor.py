"""Unit tests for the training supervisor's log accounting."""

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load():
    spec = importlib.util.spec_from_file_location(
        "train_supervised", REPO / "scripts" / "train_supervised.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["train_supervised"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_last_step_counts_only_current_launch(tmp_path):
    sup = _load()
    log = tmp_path / "t.log"
    log.write_text(
        "=== supervisor launch #0 (remaining 9000) ===\n"
        "step     0  rate_idx 1  loss 1.0\n"
        "step  1950  rate_idx 3  loss 0.5\n"
        "=== supervisor launch #1 (remaining 7500) ===\n"
        "resumed params from models_ckpt/x\n"
        "step     0  rate_idx 2  loss 0.9\n"
        "step   700  rate_idx 0  loss 0.8\n")
    # Launch #1 reached step 700; #0's 1950 must not leak through.
    assert sup.last_step(log) == 700


def test_last_step_handles_missing_and_garbled(tmp_path):
    sup = _load()
    assert sup.last_step(tmp_path / "absent.log") == 0
    log = tmp_path / "t.log"
    log.write_text("=== supervisor launch #0 ===\nstep garbage\nstep\n")
    assert sup.last_step(log) == 0
    log.write_text("step    42  loss 1.0\n")  # no marker: direct run
    assert sup.last_step(log) == 42


def test_last_saved_step_reads_actual_checkpoint_lines(tmp_path):
    """Progress derives from 'checkpoint @ step N' lines that exist, not
    from an assumed save cadence (ADVICE r2: the old inference silently
    dropped steps when --save_every didn't match the assumption)."""
    sup = _load()
    log = tmp_path / "t.log"
    log.write_text(
        "=== supervisor launch #0 (remaining 9000) ===\n"
        "step   499  rate_idx 1  loss 1.0\n"
        "checkpoint @ step 500 -> models_ckpt/x\n"
        "step   740  rate_idx 3  loss 0.5\n"
        "snapshot @ step 600 -> models_ckpt/x-s600\n")
    assert sup.last_saved_step(log) == 600
    # a later launch section resets the accounting
    with log.open("a") as f:
        f.write("=== supervisor launch #1 (remaining 8300) ===\n"
                "step   501  rate_idx 2  loss 0.9\n")
    assert sup.last_saved_step(log) == -1


def test_last_saved_step_ignores_garbage(tmp_path):
    sup = _load()
    log = tmp_path / "t.log"
    log.write_text("checkpoint @ step notanumber -> x\n")
    assert sup.last_saved_step(log) == -1
