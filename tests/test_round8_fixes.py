"""Round-8 gate pins: the peak-mem trend diff (tools/end_of_round.py),
the broadcast-audit scale-label derivation, and the reliable-checkpoint
cleanup conf the advisor flagged."""

from __future__ import annotations

import pytest

from tools.end_of_round import PEAK_NOISE_FLOOR, peak_mem_regressions
from tools.broadcast_audit import census_scale_of

MB = 1 << 20


class TestPeakMemGate:
    def test_flags_synthetic_regression(self):
        prev = {"sf": 0.1, "peak_mem": {"q1": 100 * MB, "q2": 64 * MB}}
        cur = {"sf": 0.1, "peak_mem": {"q1": 100 * MB, "q2": 220 * MB}}
        bad = peak_mem_regressions(cur, prev)
        assert [r["query"] for r in bad] == ["q2"]
        assert bad[0]["ratio"] == pytest.approx(3.44, abs=0.01)

    def test_2x_exactly_is_not_flagged(self):
        prev = {"sf": 0.1, "peak_mem": {"q1": 100 * MB}}
        cur = {"sf": 0.1, "peak_mem": {"q1": 200 * MB}}
        assert peak_mem_regressions(cur, prev) == []

    def test_isolated_remeasure_overrides_both_sides(self):
        """Round-9 adjudication: peakExecutionMemory is fair-share
        accounting, so a sweep transient can read several-x the peak
        an isolated run reproduces. peak_mem_isolated must (a) clear
        the current round's flag, and (b) override the PREV baseline,
        so an inflated transient never becomes the denominator that
        hides a real future blowup."""
        prev = {"sf": 0.1, "peak_mem": {"q1": 100 * MB}}
        cur = {
            "sf": 0.1,
            "peak_mem": {"q1": 900 * MB},
            "peak_mem_isolated": {"q1": 110 * MB},
        }
        assert peak_mem_regressions(cur, prev) == []
        # prev side: the 900 MB transient, now the baseline, must not
        # mask a genuine 400 MB (real) peak next round
        nxt = {"sf": 0.1, "peak_mem": {"q1": 400 * MB}}
        bad = peak_mem_regressions(nxt, cur)
        assert [r["query"] for r in bad] == ["q1"]
        assert bad[0]["prev"] == 110 * MB

    def test_unreproduced_isolation_still_fails(self):
        """When the isolated re-measure CONFIRMS the growth, the gate
        fails on the isolated number."""
        prev = {"sf": 0.1, "peak_mem": {"q1": 100 * MB}}
        cur = {
            "sf": 0.1,
            "peak_mem": {"q1": 900 * MB},
            "peak_mem_isolated": {"q1": 850 * MB},
        }
        bad = peak_mem_regressions(cur, prev)
        assert [r["query"] for r in bad] == ["q1"]
        assert bad[0]["cur"] == 850 * MB

    def test_sub_floor_priors_skipped(self):
        # a 1 MB stage jumping to 10 MB is scheduling noise, not a
        # broadcast blow-up — the floor keeps the gate signal-only
        prev = {"sf": 0.1, "peak_mem": {"tiny": 1 * MB}}
        cur = {"sf": 0.1, "peak_mem": {"tiny": 10 * MB}}
        assert peak_mem_regressions(cur, prev) == []
        assert PEAK_NOISE_FLOOR == 16 * MB

    def test_new_queries_skipped(self):
        prev = {"sf": 0.1, "peak_mem": {}}
        cur = {"sf": 0.1, "peak_mem": {"newq": 10_000 * MB}}
        assert peak_mem_regressions(cur, prev) == []

    def test_sf_mismatch_not_comparable(self):
        prev = {"sf": 0.1, "peak_mem": {"q1": 100 * MB}}
        cur = {"sf": 1.0, "peak_mem": {"q1": 900 * MB}}
        assert peak_mem_regressions(cur, prev) == []

    def test_missing_telemetry_tolerated(self):
        # a run with the UI disabled has no peak_mem dict at all
        assert peak_mem_regressions({"sf": 0.1}, {"sf": 0.1}) == []


class TestBroadcastAuditScaleLabel:
    def test_derives_from_dir_basename(self):
        assert census_scale_of("/tmp/sf10") == "sf10"
        assert census_scale_of("/tmp/sf1/") == "sf1"
        assert census_scale_of("/root/testdata/sf0.1") == "sf0.1"

    def test_rejects_unlabelable_dir(self):
        with pytest.raises(SystemExit):
            census_scale_of("/tmp/somedata")


class TestReliableCheckpointCleanup:
    def test_clean_checkpoints_conf_is_set(self):
        """Without cleaner.referenceTracking.cleanCheckpoints=true
        (Spark default: false), every cluster_components round strands
        a labels-sized RELIABLE checkpoint directory on the shared FS
        until app exit — the advisor's round-7 medium finding."""
        from sales_data_pipeline_spark.session import _BASE_CONF

        key = "spark.cleaner.referenceTracking.cleanCheckpoints"
        assert _BASE_CONF.get(key) == "true"
