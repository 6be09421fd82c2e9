"""CLI pipeline test with encoder and decoder in SEPARATE processes.

The reference's core real-life demonstration: encoder and decoder share
only the bitstream file, the model and the configuration
(reference: src/aivc.py:117-139 spawns encode/decode/evaluate as
subprocesses).  Here the two stages run as independent python processes
and the decoded YUV must match the encoder's closed-loop output.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _make_clip(path: Path, h=64, w=48, n=5):
    yy, xx = np.mgrid[0:h, 0:w]
    with open(path, "wb") as f:
        for t in range(n):
            y = np.clip(128 + 80 * np.sin(xx / 9 + 0.4 * t)
                        + 40 * np.cos(yy / 7 - 0.2 * t), 0, 255).astype(np.uint8)
            u = np.clip(128 + 50 * np.sin((xx + yy) / 11), 0, 255).astype(
                np.uint8)[::2, ::2]
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write((255 - u).tobytes())
    return n


def _run(args):
    env = dict(os.environ)
    return subprocess.run(
        [sys.executable, "-m", "aivc_tpu", "--cpu"] + args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=540)


@pytest.mark.slow
def test_separate_process_encode_decode(tmp_path):
    clip = tmp_path / "clip_48x64_30_420.yuv"
    n = _make_clip(clip)
    bit = tmp_path / "clip.bin"
    out = tmp_path / "dec.yuv"
    log_dir = tmp_path / "logs"

    enc = _run(["-i", str(clip), "--bitstream_out", str(bit),
                "--mode", "encode", "--coding_config", "RA",
                "--gop_size", "4", "--intra_period", "4",
                "--model", "tpu-aivc-tiny", "--log_dir", str(log_dir),
                "--bitstream_debug"])
    assert enc.returncode == 0, enc.stderr[-2000:]
    assert bit.exists() and bit.stat().st_size > 0
    assert (log_dir / "detailed.jsonl").exists()
    rows = [json.loads(l) for l in (log_dir / "detailed.jsonl").open()]
    assert len(rows) == 5  # gop of 5 frames (1_GOP_4), n=5 exactly
    assert all(r["bytes"] > 0 for r in rows)

    dec = _run(["--bitstream_out", str(bit), "-o", str(out),
                "--mode", "decode", "--model", "tpu-aivc-tiny",
                "--bitstream_debug"])
    assert dec.returncode == 0, dec.stderr[-2000:]
    assert out.exists()

    # Cross-process drift check: decoder-side md5s match the encoder's
    assert "enc/dec drift check  : identical" in dec.stdout, dec.stdout[-2000:]

    # Decoded file has exactly n frames of the right geometry
    frame_bytes = 64 * 48 + 2 * 32 * 24
    assert out.stat().st_size == n * frame_bytes

    # Third process: standalone evaluation from the files alone
    ev = _run(["-i", str(clip), "-o", str(out), "--mode", "evaluate",
               "--model", "tpu-aivc-tiny"])
    assert ev.returncode == 0, ev.stderr[-2000:]
    assert "[RESULT] psnr" in ev.stdout


@pytest.mark.slow
def test_cli_stream_dir_resume_and_rate_audit(tmp_path):
    """--stream_dir resume + --rate_audit through the CLI (VERDICT r2:
    these flags were library-tested but a CLI arg-plumbing regression
    would have passed the suite)."""
    clip = tmp_path / "clip_48x64_30_420.yuv"
    _make_clip(clip, n=13)
    bit1 = tmp_path / "a.bin"
    bit2 = tmp_path / "b.bin"
    sdir = tmp_path / "chunks"

    enc = _run(["-i", str(clip), "--bitstream_out", str(bit1),
                "--mode", "encode", "--coding_config", "RA",
                "--gop_size", "4", "--intra_period", "8",
                "--model", "tpu-aivc-tiny", "--stream_dir", str(sdir),
                "--rate_audit"])
    assert enc.returncode == 0, enc.stderr[-2000:]

    # --rate_audit printed a parseable overhead report
    lines = {l.split(":")[0].strip(): l.split(":", 1)[1].strip()
             for l in enc.stdout.splitlines() if l.startswith("[RESULT]")}
    analytic = float(lines["[RESULT] analytic rate bits"])
    real = float(lines["[RESULT] real rate bits"])
    over = float(lines["[RESULT] container overhead"].rstrip(" %"))
    assert analytic > 0 and real > 0
    assert abs(over - 100.0 * (real - analytic) / analytic) < 0.1

    # chunks were written; record their mtimes
    chunks = sorted(sdir.glob("gop_*.bin"))
    # One chunk per intra period: frames 0-8 (I + 2x4), then the tail
    assert len(chunks) == 2
    mtimes = {c.name: c.stat().st_mtime_ns for c in chunks}

    # resume: rerun with the same stream_dir -> identical bitstream,
    # chunks untouched (re-encode skipped)
    enc2 = _run(["-i", str(clip), "--bitstream_out", str(bit2),
                 "--mode", "encode", "--coding_config", "RA",
                 "--gop_size", "4", "--intra_period", "8",
                 "--model", "tpu-aivc-tiny", "--stream_dir", str(sdir)])
    assert enc2.returncode == 0, enc2.stderr[-2000:]
    assert bit1.read_bytes() == bit2.read_bytes()
    assert {c.name: c.stat().st_mtime_ns
            for c in sorted(sdir.glob("gop_*.bin"))} == mtimes

    # mismatched settings must refuse, not silently mix chunks
    enc3 = _run(["-i", str(clip), "--bitstream_out", str(bit2),
                 "--mode", "encode", "--coding_config", "RA",
                 "--gop_size", "2", "--intra_period", "8",
                 "--model", "tpu-aivc-tiny", "--stream_dir", str(sdir)])
    assert enc3.returncode != 0
    assert "different encode" in (enc3.stderr + enc3.stdout)


@pytest.mark.slow
def test_cli_rate_priority_shrinks_bitstream(tmp_path):
    """--rate_priority must plumb through to a no-larger bitstream."""
    clip = tmp_path / "clip_48x64_30_420.yuv"
    _make_clip(clip, n=5)
    base = tmp_path / "base.bin"
    prio = tmp_path / "prio.bin"
    a = _run(["-i", str(clip), "--bitstream_out", str(base),
              "--mode", "encode", "--gop_size", "4", "--intra_period", "4",
              "--model", "tpu-aivc-tiny"])
    assert a.returncode == 0, a.stderr[-2000:]
    b = _run(["-i", str(clip), "--bitstream_out", str(prio),
              "--mode", "encode", "--gop_size", "4", "--intra_period", "4",
              "--model", "tpu-aivc-tiny", "--rate_priority"])
    assert b.returncode == 0, b.stderr[-2000:]
    assert prio.stat().st_size <= base.stat().st_size
