"""One-command local verification: full test suite, oracle-parity sweep
at sf0.01 AND sf0.1 (the scale sweep catches rounding-boundary and
threshold effects the small gate can't see), then the benchmark.

Run: python scripts/verify_all.py  [--skip-bench]
Exits non-zero on the first failing stage.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str], env: dict | None = None) -> None:
    t0 = time.time()
    print(f"=== {label}: {' '.join(cmd)}", flush=True)
    e = dict(os.environ)
    e.update(env or {})
    rc = subprocess.run(cmd, cwd=ROOT, env=e).returncode
    print(f"=== {label}: rc={rc} in {time.time() - t0:.0f}s", flush=True)
    if rc != 0:
        sys.exit(rc)


def main() -> None:
    skip_bench = "--skip-bench" in sys.argv
    py = sys.executable
    run("suite", [py, "-m", "pytest", "tests/", "-q"])
    run(
        "parity sf0.01",
        [py, "-m", "pytest", "tests/test_oracle_parity.py", "-q"],
        env={"BRISTLE_TEST_SF_DIR": "/root/testdata/sf0.01"},
    )
    run(
        "parity sf0.1",
        [py, "-m", "pytest", "tests/test_oracle_parity.py", "-q"],
        env={"BRISTLE_TEST_SF_DIR": "/root/testdata/sf0.1"},
    )
    if not skip_bench:
        run("bench", [py, "bench.py"])
    print("=== all stages green")


if __name__ == "__main__":
    main()
