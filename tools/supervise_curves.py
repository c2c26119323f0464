#!/usr/bin/env python
"""Stall-tolerant supervisor for the curve-reproduction run.

The axon remote-TPU tunnel wedges a client process non-deterministically
(observed ~1/3 of launches and occasionally mid-run: the process parks on
a device fetch with zero CPU forever).  This supervisor launches
`curves_run.py train` as a child, watches the metrics CSV for progress,
and kills + relaunches on stall — `run_train` resumes from the newest
checkpoint, so a restart loses at most iters_per_checkpoint steps.  When
training reaches the target step count it runs assets+samples (also
supervised).

Usage: nohup python tools/supervise_curves.py --workdir /tmp/t2v_curves &
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CURVES = os.path.join(REPO, "tools", "curves_run.py")


def csv_progress(workdir: str) -> tuple[int, int]:
    """(last-row iteration, total data rows) of the metrics CSV.

    The LAST row, not the max: a resumed child replays from the newest
    checkpoint and APPENDS rows below the pre-kill max — under a max()
    notion of progress the replay window looks like a stall and the
    supervisor kill-loops without ever letting the child catch up.  Row
    count breaks ties when a fresh run rewrites earlier iterations."""
    p = os.path.join(workdir, "out", "logs", "metrics.csv")
    try:
        last, rows = 0, 0
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("iteration"):
                    last = int(line.split(",", 1)[0])
                    rows += 1
        return last, rows
    except OSError:
        return -1, 0


def kill_tree(proc: subprocess.Popen):
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except (ProcessLookupError, PermissionError):
        try:
            proc.kill()
        except ProcessLookupError:
            pass
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        pass


def supervised(stages: list[str], workdir: str, log: str,
               stall_s: int, startup_s: int,
               mode: str | None = None) -> None:
    """Run curves_run.py stages under restart-on-stall supervision.

    mode=None (CSV mode): watch the metrics CSV; restart after ``stall_s``
    seconds without a new row (``startup_s`` grace before the first row).
    mode="wall": no CSV to watch (assets/samples) — ``startup_s`` is the
    wall-clock bound per attempt and ``stall_s`` is unused.
    """
    attempt = 0
    while True:
        attempt += 1
        print(f"[supervisor] attempt {attempt}: {stages}", flush=True)
        with open(log, "ab") as lf:
            proc = subprocess.Popen(
                [sys.executable, CURVES, *stages, "--workdir", workdir],
                stdout=lf, stderr=lf, start_new_session=True,
            )
        t_start = time.time()
        last_prog, last_change = csv_progress(workdir), time.time()
        progressed = False  # this child has produced at least one new row
        while True:
            time.sleep(30)
            rc = proc.poll()
            if rc is not None:
                if rc == 0:
                    print(f"[supervisor] {stages} done", flush=True)
                    return
                print(f"[supervisor] child rc={rc}; retrying", flush=True)
                break
            if mode == "wall":
                # non-CSV stage (assets/samples): bound by wall clock only
                if time.time() - t_start > startup_s:
                    print("[supervisor] wall timeout; killing + retrying",
                          flush=True)
                    kill_tree(proc)
                    time.sleep(60)
                    break
                continue
            prog = csv_progress(workdir)
            if prog != last_prog:
                # only a grown DATA-row count ends the startup grace: the
                # logger writes the CSV header immediately at child start,
                # long before featurize+compile finish
                if prog[1] > last_prog[1]:
                    progressed = True
                last_prog, last_change = prog, time.time()
            # full startup grace until THIS child writes its first row
            # (featurize-check + compile + checkpoint restore)
            limit = stall_s if progressed else startup_s
            if time.time() - last_change > limit:
                print(f"[supervisor] stall at it={last_prog[0]} "
                      f"({int(time.time() - last_change)}s quiet); "
                      "killing + relaunching", flush=True)
                kill_tree(proc)
                time.sleep(60)
                break


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/t2v_curves")
    p.add_argument("--stall", type=int, default=240,
                   help="seconds without CSV progress before restart")
    p.add_argument("--startup", type=int, default=900,
                   help="grace for featurize+compile before first step")
    args = p.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    log = os.path.join(args.workdir, "run.log")
    # corpus stage first on a fresh workdir (idempotent: existing wavs are
    # kept, so mel caches stay valid across supervisor restarts).  val.txt
    # is written LAST by make_corpus — checking it (not train.txt) means a
    # supervisor death mid-corpus re-runs the stage instead of crash-
    # looping train on the missing validation filelist.
    if not os.path.exists(os.path.join(args.workdir, "val.txt")):
        supervised(["corpus"], args.workdir, log, args.stall, 900, "wall")
    supervised(["train"], args.workdir, log, args.stall, args.startup, None)
    # assets+samples: ~10 min of compiles + embeddings; bound by wall clock
    supervised(["assets", "samples"], args.workdir, log,
               args.stall, 1800, "wall")
    print("[supervisor] all stages complete", flush=True)


if __name__ == "__main__":
    main()
