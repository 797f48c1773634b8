"""One-command end-of-round battery: the full driver-gate replica.

Runs, in order: full oracle selfcheck at sf0.001 and sf0.01, the
vanilla-ANSI sweep, pytest, and bench — each as a subprocess so one
failure cannot poison the next session — and prints a single PASS/FAIL
line per stage plus a final verdict. Exit code 0 iff everything is
green.

Usage: python tools/preflight.py [--skip-bench] [--skip-pytest]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(label: str, cmd: list[str], ok_pattern: str) -> bool:
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=_HERE, capture_output=True, text=True
    )
    out = proc.stdout + proc.stderr
    tail = "\n".join(out.strip().splitlines()[-3:])
    ok = proc.returncode == 0 and re.search(ok_pattern, out) is not None
    status = "PASS" if ok else "FAIL"
    print(f"{status}  {label}  ({time.time() - t0:.0f}s)", flush=True)
    if not ok:
        print(f"      exit={proc.returncode}; tail:\n{tail}")
    return ok


def main() -> int:
    skip_bench = "--skip-bench" in sys.argv
    skip_pytest = "--skip-pytest" in sys.argv
    py = sys.executable
    stages = [
        (
            "selfcheck sf0.001",
            [py, "tools/selfcheck.py", "/root/testdata/sf0.001"],
            r"\b(\d+) ok, 0 fail, 0 no-oracle",
        ),
        (
            "selfcheck sf0.01",
            [py, "tools/selfcheck.py", "/root/testdata/sf0.01"],
            r"\b(\d+) ok, 0 fail, 0 no-oracle",
        ),
        (
            "ansi_sweep",
            [py, "tools/ansi_sweep.py"],
            r"\b(\d+) ok, 0 fail",
        ),
    ]
    if not skip_pytest:
        stages.append(
            (
                "pytest",
                [py, "-m", "pytest", "tests/", "-q"],
                r"\b\d+ passed",
            )
        )
    if not skip_bench:
        stages.append(
            (
                "bench",
                [py, "bench.py"],
                r'"n_errors":0',
            )
        )
    results = [_run(label, cmd, pat) for label, cmd, pat in stages]
    verdict = "ALL GREEN" if all(results) else "FAILURES PRESENT"
    print(verdict)
    return 0 if all(results) else 1


if __name__ == "__main__":
    sys.exit(main())
