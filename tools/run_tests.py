"""CI test runner: the whole suite, one file per pytest subprocess.

A single-process full-suite run can segfault inside the XLA CPU compiler
under memory pressure on small boxes (observed at round 2 on a 2-vCPU
host).  Running each test file in a fresh interpreter caps peak RSS per
process, makes a crash attributable to one file, and lets the suite always
finish.

    python tools/run_tests.py            # everything
    python tools/run_tests.py --quick    # skip the *_slow set (see below)
    python tools/run_tests.py -j 2       # two files at a time

Exit code 0 iff every file passes.
"""
from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Files dominated by long compiles / long trajectories; skipped by --quick.
SLOW = {
    "test_train.py",          # 300-step trajectory + AUC parity (~3 min)
    "test_harness.py",        # end-to-end CV runs (~7 min)
    "test_seqshard.py",       # sp sweeps with kernels in interpret mode
    "test_multiprocess.py",   # 2-OS-process gloo cluster bring-up
}


def run_file(path: str, timeout: int):
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", path, "-q", "--no-header"],
        cwd=REPO, capture_output=True, text=True, timeout=timeout)
    dt = time.time() - t0
    tail = (proc.stdout.strip().splitlines() or [""])[-1]
    return proc.returncode, dt, tail, proc.stdout + proc.stderr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("-j", "--jobs", type=int, default=1)
    ap.add_argument("--timeout", type=int, default=1200)
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    if args.quick:
        files = [f for f in files if os.path.basename(f) not in SLOW]

    t0 = time.time()
    results = {}
    with ThreadPoolExecutor(max_workers=max(args.jobs, 1)) as pool:
        futs = {pool.submit(run_file, f, args.timeout): f for f in files}
        for fut in futs:
            pass
        for fut, f in futs.items():
            name = os.path.basename(f)
            try:
                rc, dt, tail, full = fut.result()
            except subprocess.TimeoutExpired:
                rc, dt, tail, full = 99, args.timeout, "TIMEOUT", ""
            results[name] = (rc, dt, tail, full)
            status = "ok" if rc == 0 else f"FAIL(rc={rc})"
            print(f"{name:32s} {status:12s} {dt:7.1f}s  {tail}")

    failed = {k: v for k, v in results.items() if v[0] != 0}
    total = time.time() - t0
    print(f"\n{len(results) - len(failed)}/{len(results)} files green "
          f"in {total / 60:.1f} min")
    for name, (rc, _, _, full) in failed.items():
        print(f"\n===== {name} output =====\n{full[-4000:]}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
