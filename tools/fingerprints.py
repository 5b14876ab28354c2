#!/usr/bin/env python
"""Record per-query implementation fingerprints at end-of-round.

Run AFTER the round's final query-code commit, BEFORE the external
driver executes (the driver then checks exactly the committed code):

    python tools/fingerprints.py record [--window 50] [--also-stamp-green]

Stamping rule (see sales_data_pipeline_spark/fingerprints.py for the
mechanism's rationale):
  * every name inside the upcoming driver window (first --window names
    of the rotation) gets its CURRENT fingerprint — the driver is about
    to (re)check this exact code;
  * a name outside the window keeps its existing stamp only if its
    fingerprint is unchanged — a rewrite that missed the window stays
    unstamped and therefore fronts next round;
  * --also-stamp-green (bootstrap only) additionally stamps every
    driver-green name with its current fingerprint, asserting the code
    is unchanged since its row. Use once, with every known-stale name
    already fronted into the window via _PRIORITY.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def record(
    window: int,
    also_stamp_green: bool,
    out_path: str | None = None,
    registry: dict | None = None,
) -> dict[str, str]:
    import __spark_entry__ as entry_mod
    from sales_data_pipeline_spark import fingerprints as fp
    from sales_data_pipeline_spark.queries.base import load_all

    if registry is None:
        registry = load_all()
    current = {n: fp.query_fingerprint(s) for n, s in registry.items()}
    existing = fp.load_checked(_REPO_ROOT)
    green, _failed = entry_mod._driver_rows()

    # Keep only still-accurate stamps, then simulate the window the
    # committed code will produce WITH those stamps in effect
    # (committed_window=[] — we're computing the NEW window, the old
    # one must not front). The window list is then written into the
    # artifact and _rotated fronts it verbatim, so the driver's actual
    # window equals the stamped set — the round-5 advisor showed that
    # letting the driver re-derive the window from the post-write
    # stamps silently drops fronted-in-simulation names to the tail
    # (stamped as checked, never actually re-checked).
    kept = {
        n: f
        for n, f in existing.items()
        if n in current and current[n] == f
    }
    # Round-10 (round-9 advisor): a stamp must never outlive its actual
    # window slot. If the registry grew after the previous record, the
    # rotation fronts the new names BEFORE the committed window,
    # displacing the window's tail out of the driver's slots — those
    # names kept stamps asserting a re-check that never happened. Drop
    # them from ``kept`` so the stamp file stays honest (they re-front
    # by row age; staleness breaks ties within their cohort).
    old_window = fp.load_window(_REPO_ROOT)
    if old_window:
        rot_old = set(
            entry_mod._rotated(
                registry, checked_fps=kept, committed_window=old_window
            )[:window]
        )
        for n in old_window:
            if n in registry and n not in rot_old:
                kept.pop(n, None)
    window_names = entry_mod._rotated(
        registry, checked_fps=kept, committed_window=[]
    )[:window]

    stamps = dict(kept)
    for n in window_names:
        stamps[n] = current[n]
    if also_stamp_green:
        for n in green:
            if n in current:
                stamps[n] = current[n]

    out = out_path or os.path.join(_REPO_ROOT, fp.CHECKED_FILE)
    with open(out, "w") as f:
        json.dump(
            {
                "stamps": dict(sorted(stamps.items())),
                "window": window_names,
            },
            f,
            indent=1,
        )
        f.write("\n")
    return stamps


def check(registry: dict | None = None, window_size: int = 50) -> list[str]:
    """Registry-growth tripwire (round-9, judge ask #8), two failure
    classes, both meaning "the stamp file no longer describes what the
    driver will actually do — re-run ``record``":

     - names that have NEVER had a driver CORRECTNESS row and are NOT
       in the committed window (the upcoming driver run won't certify
       them — round 8 shipped exactly this for 4 queries and it
       surfaced only at judging);
     - committed-window names the CURRENT rotation pushes out of the
       driver's first ``window_size`` slots (round-9 advisor: when the
       registry grows after record, unchecked names front BEFORE the
       window and displace its tail — the displaced names keep fresh
       stamps asserting a re-check that will not happen).

    After a fresh ``record`` both lists are empty by construction.
    Returns the offending names; the CLI and tools/end_of_round.py
    fail on any."""
    import __spark_entry__ as entry_mod
    from sales_data_pipeline_spark import fingerprints as fp
    from sales_data_pipeline_spark.queries.base import load_all

    if registry is None:
        registry = load_all()
    window = fp.load_window(_REPO_ROOT)
    with_rows = set(entry_mod._row_rounds())
    missing = [
        n for n in registry if n not in with_rows and n not in window
    ]
    actual_head = set(entry_mod._rotated(registry)[:window_size])
    displaced = [
        n for n in window if n in registry and n not in actual_head
    ]
    return sorted(set(missing) | set(displaced))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("cmd", choices=["record", "check"])
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--also-stamp-green", action="store_true")
    args = ap.parse_args()
    if args.cmd == "check":
        missing = check()
        if missing:
            print(
                "FAIL: registry grew since the last record — these "
                "queries have no driver row and no window slot, or "
                "hold a stamp for a window slot the current rotation "
                "displaces: " + ", ".join(missing)
            )
            raise SystemExit(1)
        print("OK: every registered query has a driver row or a window "
              "slot, and no stamp outlives its slot")
        return
    stamps = record(args.window, args.also_stamp_green)
    print(f"recorded {len(stamps)} fingerprints")


if __name__ == "__main__":
    main()
