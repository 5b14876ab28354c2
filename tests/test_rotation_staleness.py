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
        # window of 2: rotation = [qa (stale), qc (unchecked), qb] -> the
        # driver will check qa and qc this round; qb keeps its stamp
        stamps = tool.record(
            window=2, also_stamp_green=False, out_path=str(out),
            registry=reg,
        )
        assert stamps["qa"] == fp.query_fingerprint(reg["qa"])  # re-stamped
        assert stamps["qc"] == fp.query_fingerprint(reg["qc"])  # new
        assert stamps["qb"] == existing["qb"]  # kept
        assert json.loads(out.read_text()) == dict(sorted(stamps.items()))

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
