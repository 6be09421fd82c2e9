"""Top-level pipeline orchestrator: encode, decode, evaluate as SEPARATE
OS processes.

The reference's real-life demonstration is precisely this process
separation — encoder and decoder share only the bitstream file, the model
name and the configuration (reference: src/aivc.py:117-139 spawns
encode.py / decode.py / evaluate.py with subprocess).  The in-process
variant is `python -m aivc_tpu`; this script is the L7 equivalent.

Usage (mirrors reference flags):
  python scripts/aivc.py -i in_416x240_50_420.yuv -o out.yuv \
      --bitstream_out video.bin --coding_config RA --gop_size 16 \
      --intra_period 32 --model tpu-aivc-tiny [--cpu] [--bitstream_debug]
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_stage(mode: str, argv) -> int:
    cmd = [sys.executable, "-m", "aivc_tpu", "--mode", mode] + argv
    print(f"[aivc] running {mode}: {' '.join(cmd[3:])}", flush=True)
    return subprocess.call(cmd, cwd=REPO)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    for mode in ("encode", "decode", "evaluate"):
        rc = run_stage(mode, argv)
        if rc != 0:
            print(f"[aivc] stage {mode} failed with {rc}", file=sys.stderr)
            return rc
    return 0


if __name__ == "__main__":
    sys.exit(main())
