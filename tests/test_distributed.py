"""Unit tests for operators/distributed.ordered_scan (the global
rank / prefix-sum primitive) and the driver-window rotation in
__spark_entry__."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F


class TestOrderedScan:
    def _frame(self, spark, n=1000, partitions=7):
        # values deliberately non-unique so the tiebreaker matters
        return (
            spark.range(n)
            .select(
                F.col("id"),
                (F.col("id") % 13).alias("key"),
                ((F.col("id") * 37) % 101).alias("val"),
            )
            .repartition(partitions)  # scramble physical order
        )

    def test_rank_matches_global_window(self, spark):
        from sales_data_pipeline_spark.operators.distributed import (
            ordered_scan,
        )

        df = self._frame(spark)
        got = ordered_scan(
            df, [F.col("val"), F.col("id")], rank_col="r"
        ).select("id", "r")
        expect = df.select(
            "id",
            F.row_number()
            .over(W.orderBy(F.col("val"), F.col("id")))
            .cast("long")
            .alias("r"),
        )
        assert got.exceptAll(expect).count() == 0
        assert expect.exceptAll(got).count() == 0

    def test_prefix_sum_matches_global_window(self, spark):
        from sales_data_pipeline_spark.operators.distributed import (
            ordered_scan,
        )

        df = self._frame(spark)
        got = ordered_scan(
            df,
            [F.desc("val"), F.asc("id")],
            sum_cols=[("val", "cum")],
            rank_col="r",
        ).select("id", "r", "cum")
        w = W.orderBy(F.desc("val"), F.asc("id"))
        expect = df.select(
            "id",
            F.row_number().over(w).cast("long").alias("r"),
            F.sum("val")
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("cum"),
        )
        assert got.exceptAll(expect).count() == 0
        assert expect.exceptAll(got).count() == 0

    def test_more_partitions_than_rows(self, spark):
        from sales_data_pipeline_spark.operators.distributed import (
            ordered_scan,
        )

        df = spark.createDataFrame(
            [(3,), (1,), (2,)], "x int"
        )
        rows = {
            r.x: r.r
            for r in ordered_scan(
                df, ["x"], rank_col="r", num_partitions=16
            ).collect()
        }
        assert rows == {1: 1, 2: 2, 3: 3}

    def test_no_unbounded_window_in_plan(self, spark):
        import re

        from sales_data_pipeline_spark.operators.distributed import (
            ordered_scan,
        )

        plan = (
            ordered_scan(self._frame(spark), ["val", "id"], rank_col="r")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        hits = re.findall(
            r"windowspecdefinition\(([A-Za-z_][\w.]*#\d+L?) (?:ASC|DESC)",
            plan,
        )
        assert all(h.startswith("__ds_pid") for h in hits), hits
        assert "rangepartitioning" in plan


class TestDriverWindowRotation:
    def test_unchecked_and_failed_queries_lead(self):
        """Live-rotation invariants under the committed-window design:
        latest-FAILED names lead everything; the COMMITTED WINDOW from
        CHECKED_FINGERPRINTS.json (stamped green names the driver must
        actually re-check) fronts verbatim next; and every UNCHECKED
        name sorts before every green name outside that head — a new
        query must be certified the round it lands, never starved
        behind re-certifications."""
        import __spark_entry__ as e
        from sales_data_pipeline_spark import fingerprints as fp

        names = list(e.queries())
        green, failed = e._driver_rows()
        assert green, "round-1 CORRECTNESS file should be present"
        pos = {n: i for i, n in enumerate(names)}
        head = set(fp.load_window(e._REPO_ROOT)) | set(e._PRIORITY)
        # failed latest rows lead everything else
        others = [pos[n] for n in names if n not in failed]
        for f in failed:
            if f in pos and others:
                assert pos[f] < min(others)
        unchecked = [n for n in names if n not in green and n not in failed]
        greens_outside_head = [
            pos[n] for n in names if n in green and n not in head
            and n not in failed
        ]
        if unchecked and greens_outside_head:
            assert max(pos[n] for n in unchecked) < min(greens_outside_head)

    def test_oracle_keys_subset_and_order(self):
        import __spark_entry__ as e

        qs, osql = list(e.queries()), e.oracle_sql()
        assert set(osql) <= set(qs)
        # oracle dict preserves the rotated query order
        pos = {n: i for i, n in enumerate(qs)}
        opos = [pos[n] for n in osql]
        assert opos == sorted(opos)

    @staticmethod
    def _fake_registry(names):
        from sales_data_pipeline_spark.queries.base import QuerySpec

        def _fn(spark, sf_dir):  # shared body: fingerprints hash source
            return None

        return {
            n: QuerySpec(name=n, fn=_fn, oracle="SELECT 1 AS one")
            for n in names
        }

    def test_rotation_converges_when_all_checked(self, tmp_path, monkeypatch):
        import __spark_entry__ as e
        from sales_data_pipeline_spark import fingerprints as fp

        reg = self._fake_registry(["qx", "qy", "qz"])
        monkeypatch.setattr(e, "_driver_rows", lambda: (set(reg), set()))
        monkeypatch.setattr(e, "_PRIORITY", [])
        stamps = {n: fp.query_fingerprint(s) for n, s in reg.items()}
        # all green + all fingerprints current -> plain sorted tail
        assert e._rotated(reg, checked_fps=stamps) == sorted(reg)

    def test_failed_latest_row_refronts(self, monkeypatch):
        import __spark_entry__ as e
        from sales_data_pipeline_spark import fingerprints as fp

        reg = self._fake_registry(["a", "b", "c", "d"])
        monkeypatch.setattr(
            e, "_driver_rows", lambda: ({"a", "c"}, {"b"})
        )
        monkeypatch.setattr(e, "_PRIORITY", [])
        stamps = {n: fp.query_fingerprint(s) for n, s in reg.items()}
        # b failed its latest driver row: it must lead, then unchecked d,
        # then fresh green a/c
        assert e._rotated(reg, checked_fps=stamps) == ["b", "d", "a", "c"]

    def test_latest_row_resolved_by_numeric_round(self, tmp_path, monkeypatch):
        import json

        import __spark_entry__ as e

        # r99 says q failed; r100 says q is green. Lexicographic filename
        # order visits r100 BEFORE r99 ("r100" < "r99") and lets the
        # stale failure win; numeric-round order must let r100 (the true
        # latest) decide.
        ok = {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": None,
        }
        bad = dict(ok, hash_match=False)
        (tmp_path / "CORRECTNESS_r99.json").write_text(
            json.dumps({"q": bad})
        )
        (tmp_path / "CORRECTNESS_r100.json").write_text(
            json.dumps({"q": ok})
        )
        monkeypatch.setattr(e, "_REPO_ROOT", str(tmp_path))
        green, failed = e._driver_rows()
        assert green == {"q"} and failed == set()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
