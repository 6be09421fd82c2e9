"""Stall-resilient training supervisor for the shared-relay TPU.

The CI TPU sits behind a remote relay that occasionally drops a
connection mid-step; the in-process JAX call then blocks forever and the
run is unrecoverable from inside the process (observed round 2: a
1950-step run wedged for 15 minutes and a probe matmul from a second
process hung too until the wedged process was killed).  This supervisor
makes long unattended runs survive that failure mode:

  * launches scripts/train_toy.py in its own process group,
  * watches the log file; if it stops growing for --stall_s seconds,
    kills the process group (the relay frees up when the wedged client
    dies) and relaunches,
  * each relaunch resumes from the --out checkpoint and trains only the
    REMAINING steps (parsed from the last "step N" log line), so the
    cosine schedule keeps decaying across restarts instead of resetting,
  * stops at --deadline_s total wall-clock, leaving the last checkpoint
    in place.

Usage:
  python scripts/train_supervised.py --steps 9000 --out models_ckpt/x \
      -- <extra train_toy args...>
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def last_step(log: Path) -> int:
    """Highest 'step N' in the CURRENT launch's log section (0 if none).

    Each launch appends a '=== supervisor launch' marker and train_toy
    counts its steps from 0, so only lines after the last marker count.
    """
    best = 0
    try:
        text = log.read_text(errors="replace")
        text = text.rsplit("=== supervisor launch", 1)[-1]
        for line in text.splitlines():
            if line.startswith("step "):
                try:
                    best = max(best, int(line.split()[1]))
                except (IndexError, ValueError):
                    pass
    except OSError:
        pass
    return best


def last_saved_step(log: Path) -> int:
    """Highest step with an ACTUAL 'checkpoint @ step N' line in the
    current launch's log section (-1 if none).

    Progress after a stall-kill must come from checkpoints that exist on
    disk, not from an assumed save cadence: inferring (last_step //
    save_every) * save_every silently drops steps whenever the assumed
    cadence doesn't match train_toy's actual --save_every.
    """
    best = -1
    try:
        text = log.read_text(errors="replace")
        text = text.rsplit("=== supervisor launch", 1)[-1]
        for line in text.splitlines():
            if line.startswith("checkpoint @ step ") or \
                    line.startswith("snapshot @ step "):
                try:
                    best = max(best, int(line.split("step ")[1].split()[0]))
                except (IndexError, ValueError):
                    pass
    except OSError:
        pass
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, required=True,
                    help="total optimizer steps to reach across restarts")
    ap.add_argument("--out", required=True)
    ap.add_argument("--log", default="",
                    help="log path (default <out>.log)")
    ap.add_argument("--resume", default="",
                    help="initial checkpoint for the FIRST launch; later "
                         "launches resume from --out")
    ap.add_argument("--stall_s", type=float, default=240.0,
                    help="kill the run if the log is silent this long")
    ap.add_argument("--first_step_grace_s", type=float, default=1200.0,
                    help="stall allowance before the first 'step' line of "
                         "a launch: the initial jit compile is minutes of "
                         "legitimate log silence (an uncached remote "
                         "compile of the train step took ~11 min), and a "
                         "240 s stall_s was observed killing every launch "
                         "mid-compile in a loop")
    ap.add_argument("--deadline_s", type=float, default=0.0,
                    help="stop launching after this much wall-clock (0 = "
                         "run to completion)")
    ap.add_argument("--max_restarts", type=int, default=50)
    ap.add_argument("--initial_step", type=int, default=0,
                    help="absolute schedule step already completed by the "
                         "--resume checkpoint (supervisor relaunches keep "
                         "their own count from here on)")
    ap.add_argument("rest", nargs=argparse.REMAINDER,
                    help="extra args passed to train_toy.py (after --)")
    args = ap.parse_args()

    log = Path(args.log or f"{args.out}.log")
    extra = [a for a in args.rest if a != "--"]
    # Progress tracking depends on mid-run checkpoints existing; train_toy's
    # --save_every default is 0 (none), which would make every stall-kill
    # restart from the launch's starting checkpoint.  Force a cadence when
    # the caller didn't pick one.
    if "--save_every" not in extra:
        extra += ["--save_every", "500"]
    t0 = time.time()
    done_prior = args.initial_step  # absolute steps already completed
    restarts = 0

    while True:
        remaining = args.steps - done_prior
        if remaining <= 0:
            print(f"[supervisor] target {args.steps} steps reached")
            return 0
        if args.deadline_s and time.time() - t0 > args.deadline_s:
            print("[supervisor] deadline reached; last checkpoint stands")
            return 0
        resume = args.out if restarts and Path(args.out).is_dir() else (
            args.resume or "")
        # --steps stays the TOTAL on every launch (the cosine schedule's
        # decay_steps is baked into the compiled train step, so a
        # different value is a multi-minute remote recompile on every
        # restart); --step0 resumes the schedule position instead.
        cmd = [sys.executable, "scripts/train_toy.py",
               "--steps", str(args.steps), "--step0", str(done_prior),
               "--out", args.out]
        if resume:
            cmd += ["--resume", resume]
        cmd += extra
        # Fold the launch count into the data seed: a diverged launch
        # that made no checkpoint otherwise replays the IDENTICAL batch
        # stream from the identical params and diverges at the identical
        # step, forever (observed: three bit-identical launches each
        # aborting at step 313).  train_toy's stream seeding is
        # (seed, slot, step0), so varying seed per launch redraws the
        # trajectory while stall-kill resumes stay deterministic per
        # launch.
        if not any(a == "--seed" or a.startswith("--seed=")
                   for a in extra):
            cmd += ["--seed", str(restarts)]
        print(f"[supervisor] launch #{restarts}: steps "
              f"{done_prior}..{args.steps} (resume={resume or 'fresh'})",
              flush=True)
        with open(log, "a") as lf:
            lf.write(f"\n=== supervisor launch #{restarts} "
                     f"(remaining {remaining}) ===\n")
            lf.flush()
            proc = subprocess.Popen(cmd, cwd=REPO, stdout=lf,
                                    stderr=subprocess.STDOUT,
                                    start_new_session=True)
        try:
            while True:
                try:
                    proc.wait(timeout=15)
                    break
                except subprocess.TimeoutExpired:
                    pass
                silent = time.time() - log.stat().st_mtime
                allowed = (args.stall_s if last_step(log) > 0
                           else max(args.stall_s, args.first_step_grace_s))
                over_deadline = (args.deadline_s
                                 and time.time() - t0 > args.deadline_s)
                if silent > allowed or over_deadline:
                    why = ("deadline" if over_deadline
                           else f"stalled {silent:.0f}s")
                    print(f"[supervisor] {why}; killing process group",
                          flush=True)
                    os.killpg(proc.pid, signal.SIGKILL)
                    proc.wait()
                    break
        except KeyboardInterrupt:
            os.killpg(proc.pid, signal.SIGKILL)
            raise
        # Progress: train_toy logs ABSOLUTE step numbers (step0-based) and
        # a 'checkpoint @ step N' line for every save it actually made.
        # The checkpoint on disk holds the params AFTER completing step N,
        # so the relaunch resumes at N + 1 — resuming at N would re-apply
        # an already-applied optimizer step.
        if proc.returncode == 0:
            done_prior = args.steps
        else:
            saved = last_saved_step(log)
            if saved >= 0:
                done_prior = max(done_prior, saved + 1)
        restarts += 1
        if restarts > args.max_restarts:
            print("[supervisor] too many restarts; giving up")
            return 1


if __name__ == "__main__":
    sys.exit(main())
