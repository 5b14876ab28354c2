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
oracle SQL + "\\x00" + per-module source hashes of every
``sales_data_pipeline_spark.*`` module the fn references). The module
hashes close round 5's documented blind spot: an operator-module edit
(e.g. the scoped-persist refactor in ``operators/dedup.py``) now changes
the fingerprint of every query whose fn imports that module, fronting
the whole dependent family with no manual ``_PRIORITY`` entry.
Granularity is deliberately per-module (a comment-only edit fronts the
family too — over-checking, never under-checking). Remaining blind spot
(documented, deliberate): helpers defined inside the same
``queries/*.py`` file as the fn are NOT hashed — including the defining
module would front all ~80 co-located queries whenever any one of them
changes, defeating the window. Exception (round-7, closing the round-6
verdict's gap): ``queries.base`` IS tracked — ``det_sum``/``det_round``/
``table``/``events_table`` are semantics-bearing shared code every
money/timestamp query depends on, and it defines no queries of its own,
so tracking it can't collapse the window onto one file's co-located
queries. A ``base.py`` edit fronts essentially the whole catalog, which
is the over-checking direction this design prefers; the stale-green
front is ordered oldest-driver-row-first, so even a catalog-wide front
degrades gracefully into the green-tail aging order.

``CHECKED_FINGERPRINTS.json`` format (v2)::

    {"stamps": {name: fingerprint, ...}, "window": [name, ...]}

``window`` is the exact ordered head ``tools/fingerprints.py record``
computed AND stamped: ``_rotated`` fronts it verbatim so the driver's
actual window equals the stamped set (the round-5 advisor showed the
two diverge if the driver re-derives the window from the post-write
stamps — a fronted-in-simulation query gets stamped fresh, then sorts
into the tail of the driver's own rotation and is never re-checked).
The legacy v1 flat ``{name: fingerprint}`` form still loads (no window).
"""

from __future__ import annotations

import hashlib
import importlib
import importlib.util
import inspect
import json
import os
import re
import types

CHECKED_FILE = "CHECKED_FINGERPRINTS.json"

_PKG = "sales_data_pipeline_spark"
# queries.* excluded: hashing a query's own defining module would front
# every co-located query on any single-fn edit (see module docstring).
_UNTRACKED_PREFIX = _PKG + ".queries"
# ...except shared semantics-bearing infrastructure that defines no
# queries itself (see module docstring): an edit to det_sum/table must
# front dependents even though the module lives under queries/.
_TRACKED_EXCEPTIONS = frozenset({_PKG + ".queries.base"})

_module_hash_cache: dict[str, str] = {}

_FROM_IMPORT_RE = re.compile(
    r"^\s*from\s+(" + re.escape(_PKG) + r"[\w.]*)\s+import\s+"
    r"(\([^)]*\)|[^\n]+)",
    re.MULTILINE,
)
_PLAIN_IMPORT_RE = re.compile(
    r"^\s*import\s+(" + re.escape(_PKG) + r"[\w.]*)", re.MULTILINE
)


def _tracked(modname: str | None) -> bool:
    if not modname or not modname.startswith(_PKG):
        return False
    if modname in _TRACKED_EXCEPTIONS:
        return True
    if modname == __name__ or modname.startswith(_UNTRACKED_PREFIX):
        return False
    return True


def _module_hash(modname: str) -> str | None:
    """sha256 of a module's source, cached per-process; None when the
    module can't be imported or has no retrievable source."""
    if modname in _module_hash_cache:
        return _module_hash_cache[modname]
    try:
        mod = importlib.import_module(modname)
        src = inspect.getsource(mod)
    except Exception:
        _module_hash_cache[modname] = None
        return None
    h = hashlib.sha256(src.encode("utf-8")).hexdigest()
    _module_hash_cache[modname] = h
    return h


def _code_names(code) -> set[str]:
    """co_names of a code object plus all nested code objects
    (comprehensions, closures inside the query fn)."""
    names = set(code.co_names)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            names |= _code_names(const)
    return names


def dep_modules(fn) -> set[str]:
    """Tracked-package modules a query fn references: module-level
    imports resolved through ``__globals__`` (aliased modules and
    imported callables/classes) plus inline ``from pkg.x import ...``
    statements matched in the fn source."""
    mods: set[str] = set()
    code = getattr(fn, "__code__", None)
    if code is not None:
        g = getattr(fn, "__globals__", {})
        for name in _code_names(code):
            obj = g.get(name)
            if obj is None:
                continue
            modname = (
                obj.__name__
                if isinstance(obj, types.ModuleType)
                else getattr(obj, "__module__", None)
            )
            if _tracked(modname):
                mods.add(modname)
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = ""
    for m in _PLAIN_IMPORT_RE.finditer(src):
        modname = m.group(1)
        if _tracked(modname):
            mods.add(modname)
    for m in _FROM_IMPORT_RE.finditer(src):
        base, imported = m.group(1), m.group(2).strip("()")
        for item in imported.split(","):
            name = item.strip().split(" as ")[0].strip()
            if not name:
                continue
            # `from pkg.operators import dedup` imports the MODULE
            # dedup, not a symbol of operators/__init__ — resolve to
            # the submodule when one exists, else fall back to base.
            cand = f"{base}.{name}"
            target = cand if _is_module(cand) else base
            if _tracked(target):
                mods.add(target)
    return mods


_is_module_cache: dict[str, bool] = {}


def _is_module(modname: str) -> bool:
    if modname not in _is_module_cache:
        try:
            _is_module_cache[modname] = (
                importlib.util.find_spec(modname) is not None
            )
        except (ImportError, ValueError, ModuleNotFoundError):
            _is_module_cache[modname] = False
    return _is_module_cache[modname]


_module_deps_cache: dict[str, set[str]] = {}


def _module_deps(modname: str) -> set[str]:
    """Tracked modules a tracked module imports (parsed from source
    with the same regexes dep_modules uses; cached per-process)."""
    if modname in _module_deps_cache:
        return _module_deps_cache[modname]
    deps: set[str] = set()
    try:
        src = inspect.getsource(importlib.import_module(modname))
    except Exception:
        _module_deps_cache[modname] = deps
        return deps
    for m in _PLAIN_IMPORT_RE.finditer(src):
        if _tracked(m.group(1)):
            deps.add(m.group(1))
    for m in _FROM_IMPORT_RE.finditer(src):
        base, imported = m.group(1), m.group(2).strip("()")
        for item in imported.split(","):
            name = item.strip().split(" as ")[0].strip()
            if not name:
                continue
            cand = f"{base}.{name}"
            target = cand if _is_module(cand) else base
            if _tracked(target):
                deps.add(target)
    _module_deps_cache[modname] = deps
    return deps


def _dep_closure(mods: set[str]) -> set[str]:
    """Transitive closure over tracked-module imports: an edit to a
    helper module (e.g. scale.py) fronts every query whose operator
    module delegates to it, not just queries importing it directly —
    the blind spot observed when operators/dedup.py started delegating
    its gate to scale.py."""
    seen: set[str] = set()
    frontier = set(mods)
    while frontier:
        m = frontier.pop()
        if m in seen:
            continue
        seen.add(m)
        frontier |= _module_deps(m) - seen
    return seen


def query_fingerprint(spec) -> str:
    """sha256 over the undecorated query fn's source, its oracle SQL,
    and the source hashes of every tracked module the fn references —
    transitively, so helper-module edits front dependent families."""
    fn = getattr(spec.fn, "__wrapped__", spec.fn)
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):  # builtins / REPL-defined: best effort
        src = repr(fn)
    dep_part = "\n".join(
        f"{m}:{h}"
        for m in sorted(_dep_closure(dep_modules(fn)))
        if (h := _module_hash(m)) is not None
    )
    payload = src + "\x00" + (spec.oracle or "") + "\x00" + dep_part
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()


def _read(repo_root: str) -> dict:
    try:
        with open(os.path.join(repo_root, CHECKED_FILE)) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    return data if isinstance(data, dict) else {}


def load_checked(repo_root: str) -> dict[str, str]:
    """name -> fingerprint recorded at the query's last driver check;
    {} when the file is absent (every green query then counts stale,
    which only over-fronts — never under-checks). Reads both the v2
    ``{"stamps": ..., "window": ...}`` and legacy flat formats."""
    data = _read(repo_root)
    if "stamps" in data and isinstance(data["stamps"], dict):
        return data["stamps"]
    return {k: v for k, v in data.items() if isinstance(v, str)}


def load_window(repo_root: str) -> list[str]:
    """The exact ordered driver window committed by the last
    ``tools/fingerprints.py record`` run; [] for legacy/absent files."""
    data = _read(repo_root)
    win = data.get("window")
    return win if isinstance(win, list) else []


def stale_names(registry: dict, checked: dict[str, str]) -> set[str]:
    """Names whose current fingerprint doesn't match the recorded one
    (includes never-recorded names; callers intersect with driver-green
    to decide fronting)."""
    return {
        name
        for name, spec in registry.items()
        if checked.get(name) != query_fingerprint(spec)
    }
