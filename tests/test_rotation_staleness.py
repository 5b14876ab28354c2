"""Fingerprint-staleness pins for the driver-rotation window.

Round 4 proved the gap this closes: a query rewritten AFTER its green
driver row kept sorting into the green tail, so the rewrite was never
re-checked. `_rotated` must front any green query whose current
fn+oracle fingerprint differs from the one recorded at its last check
(CHECKED_FINGERPRINTS.json, written by tools/fingerprints.py).

Pure-Python tests: a dummy registry + monkeypatched driver rows, no
SparkSession.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from sales_data_pipeline_spark import fingerprints as fp
from sales_data_pipeline_spark.queries.base import QuerySpec


def _fn_a(spark, sf_dir):
    return "a"


def _fn_a2(spark, sf_dir):
    return "a-rewritten"


def _fn_b(spark, sf_dir):
    return "b"


def _fn_c(spark, sf_dir):
    return "c"


def _spec(name, fn, oracle="SELECT 1 AS one"):
    return QuerySpec(name=name, fn=fn, oracle=oracle)


@pytest.fixture()
def rows(monkeypatch):
    """Set the (green, failed) driver-row sets and neutralize _PRIORITY
    (its force-recheck entries are round-specific, not under test)."""

    def set_rows(green, failed=()):
        monkeypatch.setattr(
            entry_mod, "_driver_rows", lambda: (set(green), set(failed))
        )
        monkeypatch.setattr(entry_mod, "_PRIORITY", [])

    return set_rows


class TestFingerprint:
    def test_changes_with_fn_source(self):
        assert fp.query_fingerprint(_spec("q", _fn_a)) != fp.query_fingerprint(
            _spec("q", _fn_a2)
        )

    def test_changes_with_oracle(self):
        assert fp.query_fingerprint(
            _spec("q", _fn_a, "SELECT 1 AS one")
        ) != fp.query_fingerprint(_spec("q", _fn_a, "SELECT 2 AS one"))

    def test_stable_across_calls(self):
        s = _spec("q", _fn_a)
        assert fp.query_fingerprint(s) == fp.query_fingerprint(s)

    def test_unwraps_decorated_fn(self):
        # the registry stores the `entered` wrapper; identical wrappers
        # must not collapse every query to one fingerprint
        def wrap(fn):
            def entered(spark, sf_dir):
                return fn(spark, sf_dir)

            entered.__wrapped__ = fn
            return entered

        assert fp.query_fingerprint(
            _spec("q", wrap(_fn_a))
        ) != fp.query_fingerprint(_spec("q", wrap(_fn_b)))


class TestRotatedStaleness:
    def test_green_stale_fronts_before_fresh_green(self, rows):
        reg = {"qa": _spec("qa", _fn_a), "qb": _spec("qb", _fn_b)}
        rows(green=["qa", "qb"])
        # qa's recorded stamp is from the OLD implementation
        stamps = {
            "qa": fp.query_fingerprint(_spec("qa", _fn_a2)),
            "qb": fp.query_fingerprint(reg["qb"]),
        }
        order = entry_mod._rotated(reg, checked_fps=stamps)
        assert order == ["qa", "qb"]
        # and once re-stamped with the current code, it returns to tail
        stamps["qa"] = fp.query_fingerprint(reg["qa"])
        order = entry_mod._rotated(reg, checked_fps=stamps)
        assert order == ["qa", "qb"]  # both fresh -> plain sorted tail

    def test_green_unstamped_counts_stale(self, rows):
        reg = {"qa": _spec("qa", _fn_a), "qb": _spec("qb", _fn_b)}
        rows(green=["qa", "qb"])
        stamps = {"qa": fp.query_fingerprint(reg["qa"])}  # qb never stamped
        order = entry_mod._rotated(reg, checked_fps=stamps)
        assert order == ["qb", "qa"]

    def test_failed_fronts_before_stale(self, rows):
        reg = {
            "qa": _spec("qa", _fn_a),
            "qb": _spec("qb", _fn_b),
            "qc": _spec("qc", _fn_c),
        }
        rows(green=["qa", "qb"], failed=["qc"])
        stamps = {"qb": fp.query_fingerprint(reg["qb"])}  # qa stale
        order = entry_mod._rotated(reg, checked_fps=stamps)
        assert order == ["qc", "qa", "qb"]

    def test_priority_force_rechecks_green(self, rows, monkeypatch):
        reg = {"qa": _spec("qa", _fn_a), "qb": _spec("qb", _fn_b)}
        rows(green=["qa", "qb"])
        monkeypatch.setattr(entry_mod, "_PRIORITY", ["qb"])
        stamps = {n: fp.query_fingerprint(s) for n, s in reg.items()}
        order = entry_mod._rotated(reg, checked_fps=stamps)
        assert order == ["qb", "qa"]  # green + fresh, fronted anyway

    def test_unchecked_sorts_between_stale_and_green(self, rows):
        reg = {
            "qa": _spec("qa", _fn_a),  # green, fresh
            "qb": _spec("qb", _fn_b),  # never checked
        }
        rows(green=["qa"])
        stamps = {"qa": fp.query_fingerprint(reg["qa"])}
        order = entry_mod._rotated(reg, checked_fps=stamps)
        assert order == ["qb", "qa"]


class TestRecordTool:
    def test_window_stamped_outside_rewrite_dropped(
        self, rows, tmp_path, monkeypatch
    ):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tools import fingerprints as tool

        reg = {
            "qa": _spec("qa", _fn_a),  # green, stamp stale (rewritten)
            "qb": _spec("qb", _fn_b),  # green, stamp fresh
            "qc": _spec("qc", _fn_c),  # never checked
        }
        rows(green=["qa", "qb"])
        existing = {
            "qa": fp.query_fingerprint(_spec("qa", _fn_a2)),  # old code
            "qb": fp.query_fingerprint(reg["qb"]),
        }
        monkeypatch.setattr(
            fp, "load_checked", lambda root: dict(existing)
        )
        out = tmp_path / "CHECKED_FINGERPRINTS.json"
        # window of 2: rotation = [qc (unchecked — never-checked names
        # front before re-certifications since round 7), qa (stale),
        # qb] -> the driver will check qc and qa this round; qb keeps
        # its stamp
        stamps = tool.record(
            window=2, also_stamp_green=False, out_path=str(out),
            registry=reg,
        )
        assert stamps["qa"] == fp.query_fingerprint(reg["qa"])  # re-stamped
        assert stamps["qc"] == fp.query_fingerprint(reg["qc"])  # new
        assert stamps["qb"] == existing["qb"]  # kept
        data = json.loads(out.read_text())
        assert data["stamps"] == dict(sorted(stamps.items()))
        # v2: the artifact carries the exact ordered window that was
        # stamped, so _rotated can front it verbatim at driver time
        assert data["window"] == ["qc", "qa"]

    def test_driver_window_equals_stamped_window(
        self, rows, tmp_path, monkeypatch
    ):
        """The round-5 advisor's gap: a stale-green fronted in record()'s
        simulation must ALSO lead the driver's post-write rotation, even
        though its new stamp makes it look fresh. The committed window
        list closes the loop."""
        from tools import fingerprints as tool

        reg = {
            "qa": _spec("qa", _fn_a),  # green, stamp stale (rewritten)
            "qb": _spec("qb", _fn_b),  # green, stamp fresh
            "qc": _spec("qc", _fn_c),  # green, stamp fresh
        }
        rows(green=["qa", "qb", "qc"])
        existing = {
            "qa": fp.query_fingerprint(_spec("qa", _fn_a2)),
            "qb": fp.query_fingerprint(reg["qb"]),
            "qc": fp.query_fingerprint(reg["qc"]),
        }
        monkeypatch.setattr(fp, "load_checked", lambda root: dict(existing))
        out = tmp_path / "CHECKED_FINGERPRINTS.json"
        tool.record(
            window=1, also_stamp_green=False, out_path=str(out),
            registry=reg,
        )
        data = json.loads(out.read_text())
        assert data["window"] == ["qa"]
        # simulate the driver: rotation computed from the file just
        # written — its first `window` names must equal the stamped set
        driver_order = entry_mod._rotated(
            reg,
            checked_fps=data["stamps"],
            committed_window=data["window"],
        )
        assert driver_order[:1] == ["qa"]

    def test_window_zero_drops_stale_stamp(
        self, rows, tmp_path, monkeypatch
    ):
        from tools import fingerprints as tool

        reg = {"qa": _spec("qa", _fn_a)}
        rows(green=["qa"])
        monkeypatch.setattr(
            fp,
            "load_checked",
            lambda root: {"qa": fp.query_fingerprint(_spec("qa", _fn_a2))},
        )
        out = tmp_path / "f.json"
        stamps = tool.record(
            window=0, also_stamp_green=False, out_path=str(out),
            registry=reg,
        )
        # rewritten, missed the window: must stay unstamped -> fronts
        # next round instead of faking freshness
        assert "qa" not in stamps


def _fn_uses_dedup(spark, sf_dir):
    from sales_data_pipeline_spark.operators import dedup

    return dedup


def _fn_uses_ordered_scan(spark, sf_dir):
    from sales_data_pipeline_spark.operators.distributed import ordered_scan

    return ordered_scan


class TestDepModuleFingerprints:
    """Round-5 blind spot (fingerprints.py:16-21 of that round): an
    operator-module edit didn't change the query fn's source hash, so
    operator-level rewrites needed a manual _PRIORITY front. The
    fingerprint now folds in per-module source hashes of every tracked
    module the fn references."""

    def test_inline_from_pkg_import_module_resolves_submodule(self):
        mods = fp.dep_modules(_fn_uses_dedup)
        assert "sales_data_pipeline_spark.operators.dedup" in mods

    def test_inline_deep_from_import(self):
        mods = fp.dep_modules(_fn_uses_ordered_scan)
        assert "sales_data_pipeline_spark.operators.distributed" in mods

    def test_toplevel_alias_import_resolved_via_globals(self):
        # real catalog fns import operators at module top (queries/llm.py
        # style `from ...operators import dedup`); pick one and verify
        from sales_data_pipeline_spark.queries.base import load_all

        reg = load_all()
        spec = reg["dedup_minhash_lsh"]
        fn = getattr(spec.fn, "__wrapped__", spec.fn)
        assert "sales_data_pipeline_spark.operators.dedup" in fp.dep_modules(
            fn
        )

    def test_query_module_itself_not_tracked(self):
        # hashing the defining queries/*.py module would front all
        # co-located queries on any single-fn edit; queries.base is the
        # ONE tracked exception (shared semantics, defines no queries)
        from sales_data_pipeline_spark.queries.base import load_all

        reg = load_all()
        fn = getattr(
            reg["dedup_minhash_lsh"].fn, "__wrapped__",
            reg["dedup_minhash_lsh"].fn,
        )
        assert not any(
            m.startswith("sales_data_pipeline_spark.queries")
            and m != "sales_data_pipeline_spark.queries.base"
            for m in fp.dep_modules(fn)
        )

    def test_operator_edit_changes_fingerprint_and_fronts(
        self, rows, monkeypatch
    ):
        """The verdict's done-condition: an operator-file edit fronts its
        dependent queries with no _PRIORITY entry."""
        spec = _spec("qd", _fn_uses_dedup)
        reg = {"qd": spec, "qb": _spec("qb", _fn_b)}
        rows(green=["qd", "qb"])
        stamps = {n: fp.query_fingerprint(s) for n, s in reg.items()}
        # fresh stamps: plain green tail
        assert entry_mod._rotated(reg, checked_fps=stamps) == ["qb", "qd"]
        # simulate an edit to operators/dedup.py: its source hash moves
        real_hash = fp._module_hash
        monkeypatch.setattr(
            fp,
            "_module_hash",
            lambda m: "0" * 64
            if m == "sales_data_pipeline_spark.operators.dedup"
            else real_hash(m),
        )
        assert fp.query_fingerprint(spec) != stamps["qd"]
        # qd now fronts as fingerprint-stale; qb untouched stays tail
        assert entry_mod._rotated(reg, checked_fps=stamps) == ["qd", "qb"]


class TestRowsOnlyTail:
    def test_no_oracle_greens_sort_behind_every_oracled_green(
        self, rows, monkeypatch
    ):
        """Round-13 (judge ask #6): a GREEN rows-only query (oracle is
        None — the driver can only record err: no_oracle for it) must
        never outrank an oracled green for a hash-checked window slot,
        however old its row is; unchecked rows-only queries still front
        for their first certification."""
        reg = {
            "q_rows_only": _spec("q_rows_only", _fn_a, oracle=None),
            "q_oracled": _spec("q_oracled", _fn_b),
        }
        rows(green=list(reg))
        # rows-only row is OLDER — age alone would front it
        monkeypatch.setattr(
            entry_mod,
            "_row_rounds",
            lambda: {"q_rows_only": 1, "q_oracled": 9},
        )
        stamps = {n: fp.query_fingerprint(s) for n, s in reg.items()}
        order = entry_mod._rotated(reg, checked_fps=stamps)
        assert order == ["q_oracled", "q_rows_only"]
        # unchecked (no driver row at all): fronts regardless of oracle
        rows(green=["q_oracled"])
        order = entry_mod._rotated(reg, checked_fps=stamps)
        assert order[0] == "q_rows_only"


class TestGreenTailAging:
    def test_oldest_driver_row_fronts_first(self, rows, monkeypatch):
        reg = {n: _spec(n, _fn_a) for n in ("q_new", "q_mid", "q_old")}
        rows(green=list(reg))
        monkeypatch.setattr(
            entry_mod,
            "_row_rounds",
            lambda: {"q_new": 5, "q_mid": 3, "q_old": 1},
        )
        stamps = {n: fp.query_fingerprint(s) for n, s in reg.items()}
        order = entry_mod._rotated(reg, checked_fps=stamps)
        assert order == ["q_old", "q_mid", "q_new"]

    def test_row_rounds_parses_latest_round(self, tmp_path, monkeypatch):
        """Synthetic CORRECTNESS fixtures (round-6 advisor: asserting on
        the live committed artifacts breaks as soon as green-tail aging
        refreshes the pinned query's row). Covers the numeric-round
        sort: r10 must override r9, which lexicographic glob order
        ('_r10' < '_r9') would get wrong."""
        ok = {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None}
        (tmp_path / "CORRECTNESS_r9.json").write_text(
            json.dumps({"qa": ok, "qb": ok})
        )
        (tmp_path / "CORRECTNESS_r10.json").write_text(
            json.dumps({"qa": ok})
        )
        monkeypatch.setattr(entry_mod, "_REPO_ROOT", str(tmp_path))
        rounds = entry_mod._row_rounds()
        assert rounds == {"qa": 10, "qb": 9}

    def test_row_rounds_parses_live_artifacts(self):
        # weak live sanity only: files parse and rounds are positive —
        # no pin on any specific query's round (aging refreshes them)
        rounds = entry_mod._row_rounds()
        assert rounds, "committed CORRECTNESS files should parse"
        assert min(rounds.values()) >= 1


class TestTransitiveDeps:
    """Round-6 blind spot, observed live: operators/dedup.py delegates
    its broadcast gate to scale.py, but only DIRECTLY referenced
    modules were hashed — a scale.py edit left every dedup query's
    fingerprint unchanged. The closure fixes that."""

    def test_closure_includes_helper_of_operator(self):
        # dedup imports scale; a fn referencing dedup must transitively
        # fingerprint scale
        direct = fp.dep_modules(_fn_uses_dedup)
        closure = fp._dep_closure(direct)
        assert "sales_data_pipeline_spark.scale" in closure

    def test_closure_excludes_query_modules(self):
        closure = fp._dep_closure(fp.dep_modules(_fn_uses_dedup))
        assert not any(
            m.startswith("sales_data_pipeline_spark.queries")
            and m != "sales_data_pipeline_spark.queries.base"
            for m in closure
        )

    def test_helper_hash_participates_in_fingerprint(self, monkeypatch):
        spec = _spec("qd", _fn_uses_dedup)
        before = fp.query_fingerprint(spec)
        real = fp._module_hash

        def fake(modname):
            if modname == "sales_data_pipeline_spark.scale":
                return "deadbeef"
            return real(modname)

        monkeypatch.setattr(fp, "_module_hash", fake)
        after = fp.query_fingerprint(spec)
        assert before != after


def _fn_uses_base(spark, sf_dir):
    from sales_data_pipeline_spark.queries.base import table

    return table


class TestQueriesBaseTracked:
    """Round-7 (round-6 verdict #2): queries/base.py carries shared
    SEMANTICS — det_sum/det_round/table/events_table — that every
    money/timestamp query depends on, but the queries.* untracked
    prefix silently excluded it, so a base.py edit re-fronted nothing.
    base is now the one tracked exception under queries/."""

    def test_base_module_is_tracked(self):
        assert fp._tracked("sales_data_pipeline_spark.queries.base")
        # the blanket exclusion still holds for query-defining modules
        assert not fp._tracked("sales_data_pipeline_spark.queries.core")
        assert not fp._tracked("sales_data_pipeline_spark.queries.llm")

    def test_catalog_fn_transitively_fingerprints_base(self):
        from sales_data_pipeline_spark.queries.base import load_all

        reg = load_all()
        fn = getattr(
            reg["revenue_by_nation"].fn, "__wrapped__",
            reg["revenue_by_nation"].fn,
        )
        closure = fp._dep_closure(fp.dep_modules(fn))
        assert "sales_data_pipeline_spark.queries.base" in closure

    def test_base_edit_fronts_dependents_without_priority(
        self, rows, monkeypatch
    ):
        """The verdict's done-condition: a base.py edit fronts dependent
        queries with no _PRIORITY entry."""
        spec = _spec("qbase", _fn_uses_base)
        reg = {"qbase": spec, "qb": _spec("qb", _fn_b)}
        rows(green=["qbase", "qb"])
        stamps = {n: fp.query_fingerprint(s) for n, s in reg.items()}
        assert entry_mod._rotated(reg, checked_fps=stamps) == [
            "qb", "qbase",
        ]  # both fresh -> aging tail (equal rounds, name order)
        real_hash = fp._module_hash
        monkeypatch.setattr(
            fp,
            "_module_hash",
            lambda m: "1" * 64
            if m == "sales_data_pipeline_spark.queries.base"
            else real_hash(m),
        )
        assert fp.query_fingerprint(spec) != stamps["qbase"]
        assert entry_mod._rotated(reg, checked_fps=stamps) == [
            "qbase", "qb",
        ]


class TestRotatedHeadDedup:
    """Round-6 advisor: the committed-window comprehension filtered with
    a `seen` set that was never updated during the comprehension, so a
    duplicated name inside CHECKED_FINGERPRINTS.json's window (or
    _PRIORITY) entered the head twice."""

    def test_duplicate_window_entries_enter_once(self, rows):
        reg = {"qa": _spec("qa", _fn_a), "qb": _spec("qb", _fn_b)}
        rows(green=["qa", "qb"])
        stamps = {n: fp.query_fingerprint(s) for n, s in reg.items()}
        order = entry_mod._rotated(
            reg, checked_fps=stamps,
            committed_window=["qa", "qa", "qb", "qa"],
        )
        assert order == ["qa", "qb"]

    def test_duplicate_priority_entries_enter_once(self, rows, monkeypatch):
        reg = {"qa": _spec("qa", _fn_a), "qb": _spec("qb", _fn_b)}
        rows(green=["qa", "qb"])
        monkeypatch.setattr(entry_mod, "_PRIORITY", ["qb", "qb"])
        stamps = {n: fp.query_fingerprint(s) for n, s in reg.items()}
        order = entry_mod._rotated(reg, checked_fps=stamps)
        assert order == ["qb", "qa"]


class TestStaleFrontAging:
    def test_stale_greens_front_oldest_row_first(self, rows, monkeypatch):
        """A shared-module edit can front many queries at once (base.py
        is now tracked); the stale block must order by driver-row age so
        a catalog-wide front degrades into the aging order instead of an
        alphabetical head."""
        reg = {n: _spec(n, _fn_a) for n in ("q_new", "q_mid", "q_old")}
        rows(green=list(reg))
        monkeypatch.setattr(
            entry_mod,
            "_row_rounds",
            lambda: {"q_new": 5, "q_mid": 3, "q_old": 1},
        )
        # stamps from a DIFFERENT implementation -> all three stale
        stale_stamp = fp.query_fingerprint(_spec("x", _fn_a2))
        stamps = {n: stale_stamp for n in reg}
        order = entry_mod._rotated(reg, checked_fps=stamps)
        assert order == ["q_old", "q_mid", "q_new"]


class TestUncheckedBeatsStaleCommittedWindow:
    """Round-9 structural fix for the round-8 replay loop: the committed
    CHECKED_FINGERPRINTS window (recorded BEFORE new queries existed)
    exactly filled the driver's 50 slots, so the round's own additions
    were never driver-checked. Unchecked names now front before the
    committed window unconditionally."""

    def test_new_query_lands_in_window_despite_full_stale_window(
        self, rows, monkeypatch
    ):
        """The judge's done-condition verbatim: registry = stamps + one
        new name, a full 50-name committed window -> the new name must
        place INSIDE the top-50."""
        old_names = [f"q{i:02d}" for i in range(50)]
        reg = {n: _spec(n, _fn_a) for n in old_names}
        reg["q_added_after_record"] = _spec("q_added_after_record", _fn_c)
        rows(green=old_names)
        monkeypatch.setattr(
            entry_mod, "_row_rounds", lambda: {n: 7 for n in old_names}
        )
        stamps = {n: fp.query_fingerprint(reg[n]) for n in old_names}
        order = entry_mod._rotated(
            reg, checked_fps=stamps, committed_window=list(old_names)
        )
        assert "q_added_after_record" in order[:50]
        # stronger: it leads the window (nothing failed), and the
        # committed window still follows verbatim after it
        assert order[0] == "q_added_after_record"
        assert order[1:51] == old_names

    def test_failed_still_beats_unchecked(self, rows):
        reg = {
            "q_failed": _spec("q_failed", _fn_a),
            "q_new": _spec("q_new", _fn_c),
        }
        rows(green=[], failed=["q_failed"])
        order = entry_mod._rotated(reg, checked_fps={}, committed_window=[])
        assert order == ["q_failed", "q_new"]


class TestGreenTailAgePrimary:
    """Round-9: the green tail is ONE bucket ordered by driver-row age;
    fingerprint staleness only breaks ties within a round. With most of
    the catalog never stamped, the old stale-bucket-first order let a
    stamped r3 row (prefix_duplicate_groups) starve behind ~140 younger
    unstamped rows for two consecutive rounds."""

    def test_fresh_old_row_beats_stale_young_row(self, rows, monkeypatch):
        reg = {
            "q_old_fresh": _spec("q_old_fresh", _fn_a),  # r3, stamp matches
            "q_young_stale": _spec("q_young_stale", _fn_b),  # r6, no stamp
        }
        rows(green=list(reg))
        monkeypatch.setattr(
            entry_mod,
            "_row_rounds",
            lambda: {"q_old_fresh": 3, "q_young_stale": 6},
        )
        stamps = {"q_old_fresh": fp.query_fingerprint(reg["q_old_fresh"])}
        order = entry_mod._rotated(reg, checked_fps=stamps)
        assert order == ["q_old_fresh", "q_young_stale"]

    def test_stale_wins_tie_within_same_round(self, rows, monkeypatch):
        reg = {
            "q_a_fresh": _spec("q_a_fresh", _fn_a),
            "q_z_stale": _spec("q_z_stale", _fn_b),
        }
        rows(green=list(reg))
        monkeypatch.setattr(
            entry_mod,
            "_row_rounds",
            lambda: {"q_a_fresh": 5, "q_z_stale": 5},
        )
        stamps = {"q_a_fresh": fp.query_fingerprint(reg["q_a_fresh"])}
        order = entry_mod._rotated(reg, checked_fps=stamps)
        # same round: the stale one fronts despite sorting later by name
        assert order == ["q_z_stale", "q_a_fresh"]


class TestUncheckedFrontsBeforeStale:
    def test_new_query_beats_catalog_wide_staleness(self, rows):
        """Round-7 regression guard: tracking queries/base.py made every
        green query fingerprint-stale at once; a newly added (never
        checked) query must still land inside the driver window instead
        of starving behind ~200 re-certifications."""
        reg = {
            "q_new_query": _spec("q_new_query", _fn_c),  # never checked
            "qa": _spec("qa", _fn_a),  # green, stale stamp
            "qb": _spec("qb", _fn_b),  # green, stale stamp
        }
        rows(green=["qa", "qb"])
        stale_stamp = fp.query_fingerprint(_spec("x", _fn_a2))
        stamps = {"qa": stale_stamp, "qb": stale_stamp}
        order = entry_mod._rotated(reg, checked_fps=stamps)
        assert order[0] == "q_new_query"
