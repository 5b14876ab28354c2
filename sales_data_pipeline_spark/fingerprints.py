"""Per-query implementation fingerprints — automatic staleness for the
driver-rotation window.

The external driver writes one CORRECTNESS row per checked query, but a
green row only certifies the code AS OF that round: round 4 proved that
queries rewritten after their row silently keep a stale green. The fix:
``CHECKED_FINGERPRINTS.json`` (repo root, written by
``tools/fingerprints.py record`` at end-of-round, committed) maps each
query name to the sha256 of its implementation at the moment the driver
(re)checked it. ``__spark_entry__._rotated`` fronts any green query
whose CURRENT fingerprint no longer matches its recorded one, so a
rewrite automatically re-enters the driver window next round.

Fingerprint = sha256(source of the undecorated query fn + "\\x00" +
oracle SQL). Known limitation (documented, deliberate): edits to shared
helpers/operators the fn CALLS don't change the fn's own source, so
operator-level rewrites still need a manual `_PRIORITY` fronting (as
round 5 does for the dedup family after round 4's scoped-persist
refactor). The fn+oracle hash catches the common case — the query body
or its oracle changed — with zero risk of fronting 150 queries because
one shared module gained a comment.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os

CHECKED_FILE = "CHECKED_FINGERPRINTS.json"


def query_fingerprint(spec) -> str:
    """sha256 over the undecorated query fn's source + its oracle SQL."""
    fn = getattr(spec.fn, "__wrapped__", spec.fn)
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):  # builtins / REPL-defined: best effort
        src = repr(fn)
    payload = src + "\x00" + (spec.oracle or "")
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()


def load_checked(repo_root: str) -> dict[str, str]:
    """name -> fingerprint recorded at the query's last driver check;
    {} when the file is absent (every green query then counts stale,
    which only over-fronts — never under-checks)."""
    try:
        with open(os.path.join(repo_root, CHECKED_FILE)) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    return data if isinstance(data, dict) else {}


def stale_names(registry: dict, checked: dict[str, str]) -> set[str]:
    """Names whose current fingerprint doesn't match the recorded one
    (includes never-recorded names; callers intersect with driver-green
    to decide fronting)."""
    return {
        name
        for name, spec in registry.items()
        if checked.get(name) != query_fingerprint(spec)
    }
