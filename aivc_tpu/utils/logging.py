"""Structured console logging + per-frame results table.

Parity with the reference's observability surface
(reference: src/func_util/console_display.py:44-51 fixed-width
``[TYPE] | fn | var | value`` rows; src/func_util/result_logging.py:22-61
per-frame table with PSNR / rate split / alpha / beta columns) — but the
table is also emitted as machine-readable JSON lines, instead of a text
file the encoder parses back (the fragile pattern flagged at
reference: src/real_life/encode.py:124-136).
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict
from pathlib import Path
from typing import Optional


def print_log_msg(msg_type: str, fn: str, var: str = "", value="") -> None:
    """Fixed-width log row, reference console_display.py style."""
    print(f"[{msg_type:<6}] | {fn:<32} | {str(var):<24} | {value}")


class FrameResultLogger:
    """Writes per-frame coding results as aligned text + JSONL."""

    COLUMNS = ("idx", "type", "bytes", "bpp", "mode_bytes", "codec_bytes",
               "alpha_mean", "beta_mean")

    def __init__(self, log_dir: Optional[str | Path] = None):
        self.log_dir = Path(log_dir) if log_dir else None
        if self.log_dir:
            self.log_dir.mkdir(parents=True, exist_ok=True)
            self._txt = open(self.log_dir / "detailed.txt", "w")
            self._jsonl = open(self.log_dir / "detailed.jsonl", "w")
            header = " ".join(f"{c:>12}" for c in self.COLUMNS)
            self._txt.write(header + "\n")
        else:
            self._txt = self._jsonl = None

    def log(self, frame_result) -> None:
        d = asdict(frame_result)
        if self._txt:
            row = " ".join(
                f"{d.get(c, ''):>12.4f}" if isinstance(d.get(c), float)
                else f"{d.get(c, ''):>12}" for c in self.COLUMNS)
            self._txt.write(row + "\n")
            self._jsonl.write(json.dumps(d) + "\n")

    def close(self):
        for f in (self._txt, self._jsonl):
            if f:
                f.close()


class StageTimer:
    """Lightweight named wall-clock stage timers (transform / CDF / AC / IO),
    the per-stage observability the reference lacks (SURVEY.md §5)."""

    def __init__(self):
        self.acc = {}

    class _Ctx:
        def __init__(self, timer, name):
            self.timer, self.name = timer, name

        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *exc):
            self.timer.acc[self.name] = (
                self.timer.acc.get(self.name, 0.0)
                + time.perf_counter() - self.t0)

    def __call__(self, name: str) -> "StageTimer._Ctx":
        return StageTimer._Ctx(self, name)

    def report(self) -> str:
        total = sum(self.acc.values()) or 1e-9
        rows = [f"{k}: {v:.3f}s ({100 * v / total:.0f}%)"
                for k, v in sorted(self.acc.items(), key=lambda kv: -kv[1])]
        return " | ".join(rows)
