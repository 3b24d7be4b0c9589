#!/usr/bin/env python
"""Chunked test runner — the reliable way to run this suite on a small
host.

Running all ~300 tests in ONE pytest process exhausts this 2-CPU host:
XLA:CPU keeps every compiled executable alive for the process lifetime,
and around the ~60% mark a compile aborts (`Fatal Python error: Aborted`
inside backend_compile_and_load) or segfaults. Chunking into fresh
processes bounds the executable arena per chunk and makes the suite
deterministic to run. (The persistent XLA:CPU compile cache cannot help:
executable (de)serialization segfaults on this host — see
tests/conftest.py.)

Usage:
    python run_tests.py              # quick gate (-m "not slow")
    python run_tests.py --all       # full suite
    python run_tests.py --chunk 6   # files per pytest process
Exit code: 0 iff every chunk passed.
"""
from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="include @slow tests (full suite)")
    ap.add_argument("--chunk", type=int, default=8,
                    help="test files per pytest process")
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-chunk timeout (s)")
    args, extra = ap.parse_known_args()

    root = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(root, "tests", "test_*.py")))
    chunks = [files[i:i + args.chunk]
              for i in range(0, len(files), args.chunk)]
    marker = [] if args.all else ["-m", "not slow"]

    t0 = time.time()
    failures = []
    totals = {"passed": 0, "failed": 0, "skipped": 0, "deselected": 0}
    for ci, chunk in enumerate(chunks):
        cmd = [sys.executable, "-m", "pytest", "-q", *marker, *extra,
               *chunk]
        t1 = time.time()
        try:
            proc = subprocess.run(cmd, cwd=root, capture_output=True,
                                  text=True, timeout=args.timeout)
        except subprocess.TimeoutExpired:
            failures.append((ci, "TIMEOUT", chunk))
            print(f"chunk {ci + 1}/{len(chunks)}: TIMEOUT "
                  f"({args.timeout}s) {[os.path.basename(f) for f in chunk]}",
                  flush=True)
            continue
        tail = [ln for ln in proc.stdout.strip().splitlines() if ln][-1] \
            if proc.stdout.strip() else ""
        # "N passed, M skipped in Xs" style summary
        for part in tail.replace("=", "").split(","):
            for key in totals:
                if key in part:
                    try:
                        totals[key] += int(part.split()[0])
                    except (ValueError, IndexError):
                        pass
        ok = proc.returncode in (0, 5)  # 5 = no tests collected (all slow)
        if not ok:
            failures.append((ci, f"rc={proc.returncode}", chunk))
        print(f"chunk {ci + 1}/{len(chunks)}: "
              f"{'ok' if ok else 'FAIL'} [{time.time() - t1:.0f}s] {tail}",
              flush=True)
        if not ok:
            print(proc.stdout[-3000:], flush=True)

    dt = time.time() - t0
    print(f"\ntotal: {totals['passed']} passed, {totals['failed']} failed, "
          f"{totals['skipped']} skipped in {dt / 60:.1f} min "
          f"({len(failures)} bad chunks)")
    for ci, why, chunk in failures:
        print(f"  chunk {ci + 1}: {why}: "
              f"{[os.path.basename(f) for f in chunk]}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
