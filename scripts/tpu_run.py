"""Watchdogged TPU job runner for the axon single-chip environment.

The device tunnel has a claim race: a client started too soon after the
previous one exits (or while a stale remote claim lingers) hangs forever
pre-execution at ~0% CPU.  bench.py carries its own timeout+retry loop for
exactly this; this script generalizes it to any command so long-running
TPU jobs (pretrains, probes, gallery runs) are stall-proof:

    python scripts/tpu_run.py --log /tmp/job.log -- python scripts/x.py ...

Stall detection is OUTPUT-based, not wall-clock: if the log grows, the job
is alive no matter how long it runs; if the log is silent for --stall
seconds (default 300 — longer than any warm-cache gap between progress
lines), the process group is killed, the runner cools down (the remote
claim needs ~10 min idle to drop, measured), and the command restarts.
"""

import argparse
import os
import signal
import subprocess
import sys
import time


def run_once(cmd, log_path, stall_s):
    """Run cmd, streaming to log_path; kill on output stall.

    Returns (exit_code | None-if-stalled).
    """
    with open(log_path, "ab", buffering=0) as log:
        log.write(f"\n[tpu_run] exec: {' '.join(cmd)}\n".encode())
        proc = subprocess.Popen(
            cmd, stdout=log, stderr=log, start_new_session=True
        )
        last_size = -1
        last_change = time.time()
        while True:
            try:
                rc = proc.wait(timeout=10)
                return rc
            except subprocess.TimeoutExpired:
                pass
            size = os.path.getsize(log_path)
            now = time.time()
            if size != last_size:
                last_size, last_change = size, now
            elif now - last_change > stall_s:
                log.write(
                    f"[tpu_run] output stalled {stall_s:.0f}s; killing "
                    f"pgid {proc.pid}\n".encode()
                )
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                proc.wait()
                return None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--log", required=True, help="combined stdout+stderr log")
    p.add_argument("--stall", type=float, default=900.0,
                   help="seconds of output silence before kill+retry. "
                        "Must exceed the longest legitimate silent phase: "
                        "cold remote compiles run >500 s with no output "
                        "(measured), so anything below ~900 s turns a "
                        "fresh compile into an infinite kill/retry loop")
    p.add_argument("--retries", type=int, default=4)
    p.add_argument("--cooldown", type=float, default=720.0,
                   help="seconds to wait after a stall before retrying. "
                        "The remote claim needs ~10 min FULLY idle to "
                        "drop; a client that re-grabs early hangs forever "
                        "(it does not recover when the claim drops later "
                        "— measured: a 420 s cooldown wedged two retries "
                        "in a row)")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- command to run")
    args = p.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        raise SystemExit("no command given (use: tpu_run.py [opts] -- cmd)")

    for attempt in range(args.retries):
        rc = run_once(cmd, args.log, args.stall)
        if rc is not None:
            print(f"[tpu_run] attempt {attempt}: exit {rc}", flush=True)
            return rc
        print(
            f"[tpu_run] attempt {attempt}: stalled; cooling down "
            f"{args.cooldown:.0f}s",
            flush=True,
        )
        time.sleep(args.cooldown)
    print(f"[tpu_run] giving up after {args.retries} stalled attempts",
          flush=True)
    return 124


if __name__ == "__main__":
    sys.exit(main())
