#!/usr/bin/env python
"""End-of-round checklist runner — makes the round-5 misses structurally
impossible: a red pytest shipping unnoticed, and a PLAN_CENSUS.md /
CHECKED_FINGERPRINTS.json that trail the final code commits.

Run AFTER the round's last code commit (the artifacts it writes are
then committed as the true final commit):

    PYTHONPATH=. python tools/end_of_round.py [--window 50]
                                              [--skip-pytest]

Steps (fail-fast, each prints PASS/FAIL):
  0. git cleanliness: no uncommitted tracked .py files — the round-6
     verdict caught the census certifying a tree older than the final
     code commit because this script ran BEFORE the last commit; now it
     refuses to certify a dirty tree, making "end_of_round is the final
     step" machine-enforced instead of procedural;
  1. full `pytest tests/ -q` — the bar condition;
  2. regenerate PLAN_CENSUS.md (tools/plan_census.py) so the census
     certifies the code as committed;
  3. record CHECKED_FINGERPRINTS.json (tools/fingerprints.py) so the
     driver window equals the stamped set;
  4. sanity: census + fingerprints mtimes are >= the newest tracked
     .py file's mtime (nothing certified is stale).

Exit code 0 only when every step passes. The artifacts this script
writes (PLAN_CENSUS.md, COVERAGE.md, CHECKED_FINGERPRINTS.json) are
then committed as the round's true final commit — nothing but those
artifacts may land after it.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _run(label: str, cmd: list[str]) -> bool:
    print(f"== {label}: {' '.join(cmd)}", flush=True)
    env = dict(os.environ, PYTHONPATH=_REPO_ROOT)
    proc = subprocess.run(cmd, cwd=_REPO_ROOT, env=env)
    ok = proc.returncode == 0
    print(f"== {label}: {'PASS' if ok else f'FAIL (rc={proc.returncode})'}",
          flush=True)
    return ok


def _newest_code_mtime() -> float:
    newest = 0.0
    for pattern in (
        "sales_data_pipeline_spark/**/*.py",
        "tests/*.py",
        "__spark_entry__.py",
        "bench.py",
    ):
        for path in glob.glob(os.path.join(_REPO_ROOT, pattern),
                              recursive=True):
            newest = max(newest, os.path.getmtime(path))
    return newest


def _freshness() -> bool:
    code = _newest_code_mtime()
    ok = True
    for artifact in ("PLAN_CENSUS.md", "CHECKED_FINGERPRINTS.json"):
        path = os.path.join(_REPO_ROOT, artifact)
        fresh = os.path.exists(path) and os.path.getmtime(path) >= code
        print(f"== freshness {artifact}: {'PASS' if fresh else 'FAIL'}")
        ok = ok and fresh
    return ok


def _git_clean() -> bool:
    """No uncommitted/untracked source files: the certification this
    script produces must describe a committed tree. Artifact files the
    script itself (re)writes are exempt."""
    proc = subprocess.run(
        ["git", "status", "--porcelain"],
        cwd=_REPO_ROOT, capture_output=True, text=True,
    )
    if proc.returncode != 0:
        print("== git cleanliness: FAIL (git status errored)")
        return False
    dirty = [
        line
        for line in proc.stdout.splitlines()
        if line.strip()
        and line[3:].split(" -> ")[-1].endswith((".py", ".md", ".ini"))
        and not line[3:].startswith(
            ("PLAN_CENSUS.md", "COVERAGE.md", "SCALE.md")
        )
    ]
    ok = not dirty
    print(f"== git cleanliness: {'PASS' if ok else 'FAIL'}")
    for line in dirty:
        print(f"   uncommitted: {line}")
    return ok


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--skip-pytest", action="store_true",
                    help="when a green full run already exists this "
                    "session (the step takes ~10 min)")
    args = ap.parse_args()

    if not _git_clean():
        print("== end_of_round: FAIL (commit all source changes first; "
              "this script must certify a committed tree)")
        return 1

    steps = []
    if not args.skip_pytest:
        steps.append(("pytest", [sys.executable, "-m", "pytest",
                                 "tests/", "-q"]))
    steps += [
        ("plan census", [sys.executable, "tools/plan_census.py"]),
        ("coverage doc", [sys.executable, "gen_coverage.py"]),
        ("fingerprints", [sys.executable, "tools/fingerprints.py",
                          "record", "--window", str(args.window)]),
    ]
    ok = all(_run(label, cmd) for label, cmd in steps)
    ok = _freshness() and ok
    print(f"== end_of_round: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
