#!/usr/bin/env python3
"""One-command full-suite runner: `python run_tests.py`.

Runs every tests/test_*.py file in its OWN pytest process (a few in
parallel) and exits 0 only if every file passes. This exists because the
whole suite in ONE process segfaults XLA:CPU's backend_compile_and_load
at ~94% on this host — ~700 jit compilations accumulate compiler/arena
state until a later compile dies. Per-file processes bound compilations
far below the threshold; every test is identical to running
`pytest tests/<file> -q` by hand (tests/conftest.py still forces the
8-virtual-device CPU mesh per process).

Extra args are forwarded to every pytest invocation
(e.g. `python run_tests.py -k srgb`).
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time

JOBS = int(os.environ.get("TEST_JOBS", "3"))


def main() -> int:
    root = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(root, "tests", "test_*.py")))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2
    extra = sys.argv[1:]
    pending = list(files)
    running: list[tuple[str, subprocess.Popen]] = []
    failed: list[str] = []
    passed = 0
    t0 = time.time()

    while pending or running:
        while pending and len(running) < JOBS:
            f = pending.pop(0)
            p = subprocess.Popen(
                [sys.executable, "-m", "pytest", f, "-q", *extra],
                cwd=root, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT)
            running.append((f, p))
        done = [(f, p) for f, p in running if p.poll() is not None]
        if not done:
            time.sleep(0.2)
            continue
        for f, p in done:
            running.remove((f, p))
            out = p.stdout.read().decode(errors="replace")
            tail = [ln for ln in out.strip().splitlines() if ln]
            status = tail[-1] if tail else f"rc {p.returncode}"
            name = os.path.basename(f)
            # pytest rc 5 = no tests collected (e.g. everything deselected
            # by a forwarded -k) — not a failure
            if p.returncode in (0, 5):
                passed += 1
                print(f"  ok   {name}: {status}", flush=True)
            else:
                failed.append(name)
                print(f"  FAIL {name} (rc {p.returncode})\n{out}",
                      flush=True)

    dt = time.time() - t0
    print(f"\n{passed}/{len(files)} files green in {dt:.0f}s"
          + (f"; FAILED: {', '.join(failed)}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
