"""Round-7 fixes (round-6 verdict/advice).

1. cluster_components checkpointing is now checkpoint-dir-aware: with a
   configured checkpoint dir the loop takes RELIABLE checkpoints (what a
   real cluster needs — localCheckpoint blocks die with their executor
   and are unrecoverable by design), else it falls back to
   localCheckpoint for local/test runs. The reliable branch must keep
   the two loop invariants: lineage truncation and partitioning
   preservation (the exchange-free per-round join).
2. The CC staging frame is persist()-ed, not checkpointed — persist is
   the only materialization unpersist() can actually release (round-6
   advisor: the checkpointed staging copy stayed resident for the whole
   loop, doubling peak edge storage).
3. Round-7 find: under AQE, Dataset.checkpoint/localCheckpoint wraps an
   AdaptiveSparkPlanExec whose outputPartitioning is
   UnknownPartitioning, so the LogicalRDD LOST the repartition's hash
   partitioning and every CC round re-shuffled the whole edge set —
   the exact cost round 6 believed it had eliminated. _loop_checkpoint
   now materializes with AQE off (restored immediately), and the
   exchange-free co-partitioned join is pinned here for BOTH branches.
"""

from __future__ import annotations

import os

import pytest

from sales_data_pipeline_spark.operators import dedup


@pytest.fixture()
def checkpoint_dir(spark, tmp_path):
    """Temporarily configure a reliable checkpoint dir; restore the
    no-dir state afterwards so every other test keeps exercising the
    localCheckpoint branch."""
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None  # suite default: local branch
    d = str(tmp_path / "ckpt")
    sc.setCheckpointDir(d)
    yield d
    # Scala setCheckpointDir(null) resets checkpointDir to None
    sc._jsc.sc().setCheckpointDir(None)
    assert sc.getCheckpointDir() is None


class TestLoopCheckpointBranch:
    def test_local_branch_without_dir(self, spark):
        df = spark.range(10).repartition(3, "id")
        out = dedup._loop_checkpoint(df)
        assert out.rdd.getNumPartitions() == 3
        assert out.count() == 10
        # localCheckpoint: the underlying RDD is NOT reliably checkpointed
        assert not out.rdd._jrdd.rdd().isCheckpointed()

    def test_reliable_branch_with_dir(self, spark, checkpoint_dir):
        df = spark.range(10).repartition(3, "id")
        out = dedup._loop_checkpoint(df)
        assert out.count() == 10
        assert out.rdd.getNumPartitions() == 3
        # checkpoint files landed in the configured dir
        found = [
            f
            for root, _dirs, files in os.walk(checkpoint_dir)
            for f in files
        ]
        assert found, "reliable checkpoint wrote no files"

    def _assert_copartitioned_join_exchange_free(self, spark):
        left = dedup._loop_checkpoint(
            spark.range(100).select("id").repartition(4, "id")
        )
        right = dedup._loop_checkpoint(
            spark.range(100).select("id").repartition(4, "id")
        )
        # partitioning survived the checkpoint into the LogicalRDD
        part = (
            left._jdf.queryExecution()
            .optimizedPlan()
            .outputPartitioning()
            .toString()
        )
        assert "hashpartitioning" in part and ", 4)" in part, part
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                left.join(right, "id")
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "Exchange" not in plan, plan

    def test_local_branch_preserves_copartitioned_join(self, spark):
        """The regression round 6 shipped: with AQE on, localCheckpoint
        yielded UnknownPartitioning and this join re-shuffled BOTH
        sides. Two frames hash-partitioned on the join key at the same
        count, both checkpointed, must sort-merge join with no Exchange
        on either side."""
        self._assert_copartitioned_join_exchange_free(spark)

    def test_reliable_branch_preserves_copartitioned_join(
        self, spark, checkpoint_dir
    ):
        """Same invariant through the reliable-checkpoint branch."""
        self._assert_copartitioned_join_exchange_free(spark)

    def test_aqe_restored_after_checkpoint(self, spark):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        dedup._loop_checkpoint(spark.range(5).repartition(2, "id"))
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


class TestClusterComponentsReliable:
    def test_cc_correct_and_uses_reliable_checkpoints(
        self, spark, checkpoint_dir
    ):
        """Verdict done-condition: with a checkpoint dir set the CC loop
        uses reliable checkpoints (files appear under the dir) and still
        computes the transitive closure exactly."""
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
            "id_a long, id_b long",
        )
        out = {
            r["id"]: r["cluster_id"]
            for r in dedup.cluster_components(pairs).collect()
        }
        assert out == {
            1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20,
        }
        found = [
            f
            for root, _dirs, files in os.walk(checkpoint_dir)
            for f in files
        ]
        assert found, "CC loop took no reliable checkpoints"


class TestBenchTelemetry:
    """Round-7 (verdict #1/#7): bench.py records machine conditions and
    per-query peak execution memory so a loaded-machine artifact is
    self-evident instead of silently poisoning round-over-round deltas
    (BENCH_r06's spurious +20%)."""

    def test_machine_conditions_shape(self):
        import bench

        cond = bench._machine_conditions()
        assert cond["cpus"] >= 1
        assert cond["loadavg"] is None or len(cond["loadavg"]) == 3
        # procs_running parses on Linux; None-degradation is allowed
        assert cond["procs_running"] is None or cond["procs_running"] >= 0

    def test_stage_peak_degrades_without_ui(self, spark):
        """The suite session has spark.ui.enabled=false: StagePeak must
        degrade to None telemetry, never raise."""
        import bench

        peek = bench.StagePeak(spark)
        assert peek.peak_since_last() is None

    def test_stage_peak_monotone_watermark(self):
        import bench

        peek = bench.StagePeak.__new__(bench.StagePeak)
        peek._base = "http://x"
        peek._seen = -1
        fetched = [
            [{"stageId": 0, "peakExecutionMemory": 100},
             {"stageId": 1, "peakExecutionMemory": 300}],
            [{"stageId": 0, "peakExecutionMemory": 100},
             {"stageId": 1, "peakExecutionMemory": 300},
             {"stageId": 2, "peakExecutionMemory": 50}],
        ]
        peek._fetch = lambda url: fetched.pop(0)
        assert peek.peak_since_last() == 300  # stages 0+1 are new
        assert peek.peak_since_last() == 50   # only stage 2 is new
