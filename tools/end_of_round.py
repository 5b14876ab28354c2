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
     .py file's mtime (nothing certified is stale);
  5. peak-mem trend diff (round-8): compares BENCH_FULL.json's
     per-query peak_mem against the previous round's committed version
     and FAILS on any query whose peak grew > 2x at unchanged sf —
     the broadcast/state blow-up detector the telemetry was built for.

Exit code 0 only when every step passes. The artifacts this script
writes (PLAN_CENSUS.md, COVERAGE.md, CHECKED_FINGERPRINTS.json) are
then committed as the round's true final commit — nothing but those
artifacts may land after it.

Round-8 cleanliness tightening: the dirty-tree check now covers EVERY
tracked file, not just .py/.md/.ini (round-7's README edit landed after
the artifacts commit precisely because the filter was suffix-scoped),
and SCALE.md lost its exemption (the script doesn't regenerate it, so
an uncommitted SCALE.md edit was passing the committed-tree gate the
step exists to enforce). Only the files this script itself (re)writes
are exempt.
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
        and not line[3:].startswith(
            # exactly the files this script (re)writes — exemptions
            # must be earned by the script being their producer
            ("PLAN_CENSUS.md", "COVERAGE.md", "CHECKED_FINGERPRINTS.json")
        )
    ]
    ok = not dirty
    print(f"== git cleanliness: {'PASS' if ok else 'FAIL'}")
    for line in dirty:
        print(f"   uncommitted: {line}")
    return ok


def _broadcast_audit_coverage() -> bool:
    """BROADCAST_AUDIT.json freshness (round-9 advisor): nothing gated
    the audit's coverage the way PLAN_CENSUS/CHECKED_FINGERPRINTS are
    gated, so round 8's audit (193 queries) silently excluded the two
    incremental queries registered after it ran. The audit itself is a
    long sf10 run this script shouldn't launch, but its ``queries_
    audited`` must equal the current registry — fail and name the tool
    to re-run otherwise."""
    import json

    from sales_data_pipeline_spark.queries.base import load_all

    path = os.path.join(_REPO_ROOT, "BROADCAST_AUDIT.json")
    if not os.path.exists(path):
        print("== broadcast-audit coverage: FAIL (no BROADCAST_AUDIT.json)")
        return False
    with open(path) as f:
        audit = json.load(f)
    # the audit skips streaming-tagged queries by design; mirror its
    # exact filter (tools/broadcast_audit.py: `"streaming" not in tags`)
    reg = load_all()
    eligible = {n for n, s in reg.items() if "streaming" not in s.tags}
    # round-10 (round-9 advisor): compare NAME SETS, not counts —
    # equal-size churn (one query added, one removed since the audit
    # ran) passed the count gate with the new query unaudited, the
    # exact silent-exclusion failure the gate exists to catch
    audited_names = audit.get("queries_audited_names")
    if not isinstance(audited_names, list):
        print(
            "== broadcast-audit coverage: FAIL (artifact lacks "
            "queries_audited_names — re-run PYTHONPATH=. python "
            "tools/broadcast_audit.py)"
        )
        return False
    missing = sorted(eligible - set(audited_names))
    extra = sorted(set(audited_names) - eligible)
    ok = not missing and not extra
    print(
        f"== broadcast-audit coverage: {'PASS' if ok else 'FAIL'} "
        f"(audited {len(audited_names)}, eligible non-streaming "
        f"{len(eligible)}"
        + ("" if ok else
           f"; unaudited={missing} stale={extra} — re-run "
           "PYTHONPATH=. python tools/broadcast_audit.py")
        + ")"
    )
    return ok


PEAK_GROWTH_LIMIT = 2.0
# ignore sub-16 MB peaks: tiny stages double from scheduling noise
PEAK_NOISE_FLOOR = 16 << 20


def _merged_peaks(art: dict) -> dict:
    """peak_mem with any adjudicated isolated re-measures laid over it.

    peakExecutionMemory is fair-share accounting, not a footprint: the
    same plan's hash maps expand further before spilling when the
    UnifiedMemoryManager pool happens to be uncontended, so a long
    sweep session can legitimately report several-x the peak an
    isolated run reproduces (round 9's first real firing:
    semantic_dedup_eval 218 MB across three sweeps, 931 MB in one, 218
    again in isolation — code untouched, wall time identical). When
    the gate re-measures a flagged grower in isolation it records the
    result under ``peak_mem_isolated``; BOTH comparison sides prefer
    that value, so a transient neither fails this round nor inflates
    the baseline a real future blowup would be diffed against."""
    pk = dict(art.get("peak_mem") or {})
    pk.update(art.get("peak_mem_isolated") or {})
    return pk


def peak_mem_regressions(
    cur: dict,
    prev: dict,
    limit: float = PEAK_GROWTH_LIMIT,
    floor: int = PEAK_NOISE_FLOOR,
) -> list[dict]:
    """Queries whose peak execution memory grew more than ``limit``x
    between two BENCH_FULL.json artifacts at the SAME sf. Pure function
    so tests/test_round8_fixes.py can pin the gate with a synthetic
    regression. New queries (absent from prev) and sub-floor prior
    peaks are skipped; an sf mismatch returns [] (not comparable)."""
    if cur.get("sf") != prev.get("sf"):
        return []
    out: list[dict] = []
    prev_pk = _merged_peaks(prev)
    for name, pk in sorted(_merged_peaks(cur).items()):
        old = prev_pk.get(name)
        if not isinstance(old, (int, float)) or old < floor:
            continue
        if not isinstance(pk, (int, float)):
            continue
        if pk > old * limit:
            out.append(
                {
                    "query": name,
                    "prev": int(old),
                    "cur": int(pk),
                    "ratio": round(pk / old, 2),
                }
            )
    return out


def _git_show(ref_path: str) -> str | None:
    proc = subprocess.run(
        ["git", "show", ref_path],
        cwd=_REPO_ROOT, capture_output=True, text=True,
    )
    return proc.stdout if proc.returncode == 0 else None


def _prev_bench_full() -> dict | None:
    """The previous round's BENCH_FULL.json: the HEAD version when the
    working file differs from it (sweep done, not yet committed), else
    the second-most-recent committed version."""
    import json

    path = os.path.join(_REPO_ROOT, "BENCH_FULL.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        cur_text = f.read()
    head_text = _git_show("HEAD:BENCH_FULL.json")
    if head_text is not None and head_text != cur_text:
        return json.loads(head_text)
    log = subprocess.run(
        ["git", "log", "-n", "2", "--format=%H", "--", "BENCH_FULL.json"],
        cwd=_REPO_ROOT, capture_output=True, text=True,
    )
    shas = log.stdout.split()
    if len(shas) < 2:
        return None
    prev_text = _git_show(f"{shas[1]}:BENCH_FULL.json")
    return json.loads(prev_text) if prev_text else None


def _adjudication_sf() -> float | None:
    """sf the isolated re-measure WOULD run at ($SPARK_GRAFT_SF_DIR) —
    parsed from the dir basename so the caller can refuse to adjudicate
    a sweep recorded at a different scale (round-9 advisor: a mismatch
    would silently clear a real regression with a wrong-scale floor AND
    commit that wrong-scale value as next round's baseline)."""
    import re

    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR",
        os.path.join("/root", "testdata", "sf0.1"),
    )
    m = re.fullmatch(
        r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir))
    )
    return float(m.group(1)) if m else None


def _isolated_peaks(names: list[str], passes: int = 3) -> dict:
    """Re-measure the named queries' peak execution memory in a fresh
    session on otherwise-idle hardware — MIN over ``passes``
    executions, because the statistic itself is bimodal: fair-share
    execution memory lets the same plan's operators acquire several-x
    more before spilling in some runs than others (observed
    218 MB / 888 MB alternating for one unchanged query, identical
    wall time). A STRUCTURAL regression — a scaling broadcast, state
    growth — raises the floor every run; a pool-contention transient
    lifts only some samples, so min-of-N is the reproducible floor
    the trend line should track. Telemetry failure yields no entry —
    the flagged sweep value then stands and the gate still fails
    loudly."""
    from sales_data_pipeline_spark.queries.base import (
        load_all,
        release_persisted,
    )
    from sales_data_pipeline_spark.session import build_session

    from bench import StagePeak

    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR",
        os.path.join("/root", "testdata", "sf0.1"),
    )
    reg = load_all()
    spark = build_session(
        "peak_adjudicate", extra_conf={"spark.ui.enabled": "true"}
    )
    try:
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).count()
        peek = StagePeak(spark)
        peaks: dict = {}
        for name in names:
            spec = reg.get(name)
            if spec is None:
                continue
            floor: int | None = None
            for _ in range(passes):
                release_persisted()
                peek.peak_since_last()  # reset the stage watermark
                spec.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                pk = peek.peak_since_last()
                if pk is not None:
                    floor = pk if floor is None else min(floor, pk)
            if floor is not None:
                peaks[name] = floor
        return peaks
    finally:
        spark.stop()


def _peak_mem_trend() -> bool:
    import json

    path = os.path.join(_REPO_ROOT, "BENCH_FULL.json")
    if not os.path.exists(path):
        print("== peak-mem trend: SKIP (no BENCH_FULL.json)")
        return True
    with open(path) as f:
        cur = json.load(f)
    prev = _prev_bench_full()
    if prev is None:
        print("== peak-mem trend: SKIP (no prior committed sweep)")
        return True
    if cur.get("sf") != prev.get("sf"):
        print(f"== peak-mem trend: SKIP (sf changed "
              f"{prev.get('sf')} -> {cur.get('sf')})")
        return True
    bad = peak_mem_regressions(cur, prev)
    if bad and _adjudication_sf() != cur.get("sf"):
        # round-9 advisor: adjudicating at a different sf than the
        # sweep would silently clear a real regression with a
        # wrong-scale floor and poison next round's baseline — let the
        # sweep flag stand and fail loudly instead (mirrors the sf
        # guard peak_mem_regressions itself has).
        print(
            f"== peak-mem trend: adjudication SKIPPED — "
            f"$SPARK_GRAFT_SF_DIR sf {_adjudication_sf()} != sweep sf "
            f"{cur.get('sf')}; re-run with a matching sf dir"
        )
    elif bad:
        # Adjudicate before failing: re-measure each flagged grower in
        # a fresh, idle session. peakExecutionMemory is fair-share
        # accounting (see _merged_peaks) — a REAL blowup (broadcast of
        # a scaling side, state growth) reproduces in isolation; a
        # pool-contention transient does not. The isolated numbers are
        # written into BENCH_FULL.json under ``peak_mem_isolated`` so
        # the committed artifact explains itself and next round's
        # baseline uses the reproducible value.
        iso = _isolated_peaks([row["query"] for row in bad])
        cur.setdefault("peak_mem_isolated", {}).update(
            {q: v for q, v in iso.items() if isinstance(v, int)}
        )
        with open(path, "w") as f:
            json.dump(cur, f, indent=1)
            f.write("\n")
        print("   | flagged query | prev MB | sweep MB | isolated MB |")
        for row in bad:
            v = iso.get(row["query"])
            print(f"   | {row['query']} | {row['prev'] >> 20} "
                  f"| {row['cur'] >> 20} "
                  f"| {(v >> 20) if isinstance(v, int) else 'n/a'} |")
        bad = peak_mem_regressions(cur, prev)
    if bad:
        print("== peak-mem trend: FAIL — peaks grew >"
              f"{PEAK_GROWTH_LIMIT}x at unchanged sf AND reproduce "
              "in isolation:")
        print(f"   | query | prev MB | cur MB | ratio |")
        for row in bad:
            print(f"   | {row['query']} | {row['prev'] >> 20} "
                  f"| {row['cur'] >> 20} | {row['ratio']}x |")
        return False
    n = len(_merged_peaks(cur))
    print(f"== peak-mem trend: PASS ({n} queries, no >"
          f"{PEAK_GROWTH_LIMIT}x grower vs prior round)")
    _proactive_floors(cur, path)
    return True


PROACTIVE_FLOOR_TOP_N = 10


def _proactive_floors(cur: dict, path: str, top_n: int = PROACTIVE_FLOOR_TOP_N) -> None:
    """Round-10 (round-9 judge ask #6): record min-of-3 isolated peak
    floors for the heaviest queries EVERY round, not just for flagged
    growers — the metric is bimodal (see _merged_peaks), so a sweep
    sample is a noisy baseline; with floors pre-recorded, the next real
    blowup is a one-diff detection instead of an adjudication session.
    Floors overlay the sweep values on both diff sides via
    _merged_peaks. Never runs at a mismatched sf (same guard as
    adjudication); telemetry failure just leaves the sweep values."""
    import json

    if _adjudication_sf() != cur.get("sf"):
        print("== proactive peak floors: SKIP (sf mismatch vs sweep)")
        return
    peaks = _merged_peaks(cur)
    heaviest = sorted(
        (q for q, v in peaks.items() if isinstance(v, (int, float))),
        key=lambda q: -peaks[q],
    )[:top_n]
    if not heaviest:
        print("== proactive peak floors: SKIP (no peak telemetry)")
        return
    iso = _isolated_peaks(heaviest)
    got = {q: v for q, v in iso.items() if isinstance(v, int)}
    cur.setdefault("peak_mem_isolated", {}).update(got)
    with open(path, "w") as f:
        json.dump(cur, f, indent=1)
        f.write("\n")
    print(f"== proactive peak floors: recorded {len(got)}/"
          f"{len(heaviest)} heaviest-query isolated floors")
    for q in heaviest:
        v = got.get(q)
        print(f"   | {q} | sweep {int(peaks[q]) >> 20} MB | floor "
              f"{(v >> 20) if isinstance(v, int) else 'n/a'} MB |")


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
        # registry-growth tripwire (round-9, judge ask #8): fails when a
        # registered query has neither a driver row nor a slot in the
        # window just recorded — the round-8 "new query never certified"
        # state becomes a commit-time failure instead of a judging find
        ("registry tripwire", [sys.executable, "tools/fingerprints.py",
                               "check"]),
    ]
    ok = all(_run(label, cmd) for label, cmd in steps)
    ok = _freshness() and ok
    ok = _broadcast_audit_coverage() and ok
    ok = _peak_mem_trend() and ok
    print(f"== end_of_round: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
