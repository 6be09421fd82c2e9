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
