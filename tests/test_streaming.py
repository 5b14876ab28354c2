"""Streaming-layer tests: the stateful sessionizer's emitted sessions
must equal the batch gaps-and-islands computation (minus each user's
final open session, which stays in state under append semantics)."""

from __future__ import annotations

import pytest


def _expected_sessions(events, gap_s=1800):
    """events: list of (user_id, ts_seconds). Returns closed sessions
    per the 30-min gap rule. A user's final session also closes when
    its event-time timeout (end + gap) falls behind the final watermark
    (global max ts - gap): Trigger.AvailableNow runs a no-data batch
    after the last input batch, firing those timeouts."""
    final_watermark = max(t for _, t in events) - gap_s
    by_user: dict[int, list[int]] = {}
    for u, t in events:
        by_user.setdefault(u, []).append(t)
    out = []
    for u, ts in by_user.items():
        ts.sort()
        sessions = []
        start = end = ts[0]
        n = 1
        for t in ts[1:]:
            if t - end > gap_s:
                sessions.append((u, start, end, n))
                start = end = t
                n = 1
            else:
                end = t
                n += 1
        sessions.append((u, start, end, n))
        out.extend(
            s
            for i, s in enumerate(sessions)
            if i < len(sessions) - 1 or s[2] + gap_s <= final_watermark
        )
    return sorted(out)


@pytest.fixture()
def event_dir(spark, tmp_path):
    # (user, ts sec): u1 has 3 sessions, u2 has 2, u3 has 1 (never emits)
    base = 1_700_000_000
    rows = [
        (1, base + 0), (1, base + 60), (1, base + 120),      # s1: 3 events
        (1, base + 5000), (1, base + 5100),                  # s2: 2 events
        (1, base + 20000),                                   # s3 (open)
        (2, base + 0), (2, base + 10), (2, base + 9000),     # s1: 2, s2 open
        (3, base + 42),                                      # open only
    ]
    df = spark.createDataFrame(
        [
            (i, t * 1_000_000_000, u, "click", 1.0, "{}")
            for i, (u, t) in enumerate(rows)
        ],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    out = str(tmp_path / "stream_in")
    df.coalesce(1).write.parquet(out)
    return out, rows


def test_stateful_sessionizer_matches_batch(spark, event_dir):
    from pyspark.sql import functions as F

    from sales_data_pipeline_spark.streaming import ingest, stateful

    path, rows = event_dir
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # fixture writes ts as raw nanos longs; declare that shape directly
    # (the production reader derives its schema from the file instead)
    events = (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        )
        .format("parquet")
        .load(path)
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    )
    sessions = stateful.sessionize_stream(events, gap_minutes=30)
    name = ingest.unique_sink_name("test_sessions")
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (
            r.user_id,
            int(r.session_start.timestamp()),
            int(r.session_end.timestamp()),
            r.n_events,
        )
        for r in spark.table(name).collect()
    )
    assert got == _expected_sessions(rows)


def test_foreach_batch_partitioned_sink(spark, tmp_path):
    """Streaming -> foreachBatch -> dynamic-partition parquet sink: the
    sink pattern for incremental loads (each micro-batch upserts only
    the partitions it touches; exactly-once comes from the checkpoint +
    idempotent dynamic overwrite). End state must equal the batch read."""
    from pyspark.sql import functions as F

    from sales_data_pipeline_spark.queries.base import events_table
    from sales_data_pipeline_spark.streaming import ingest

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "by_type")
    ckpt = str(tmp_path / "ckpt")

    def upsert(batch_df, batch_id):
        (
            batch_df.withColumn("event_date", F.to_date("ts"))
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(out)
        )

    q = (
        ingest.read_events_stream(spark, sf)
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    written = spark.read.parquet(out)
    batch = events_table(spark, sf)
    assert written.count() == batch.count()
    # partition pruning works on the sink layout
    one_type = written.filter(F.col("event_type") == "click")
    assert (
        one_type.count()
        == batch.filter(F.col("event_type") == "click").count()
    )


def test_transform_with_state_running_totals(spark, tmp_path):
    """Spark 4's transformWithStateInPandas (the arbitrary-stateful
    successor to applyInPandasWithState): per-user running purchase
    totals in ValueState across MULTIPLE micro-batches
    (maxFilesPerTrigger=1 -> one batch per chunk file). Gated on
    google.protobuf — the state-server protocol needs it and this
    environment may not ship it; applyInPandasWithState (covered by
    the sessionizer tests above) is the dependency-free stateful path.
    """
    pytest.importorskip("google.protobuf.descriptor")
    import glob as globmod
    import shutil

    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming import StatefulProcessor

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    src = tmp_path / "chunks"
    src.mkdir()
    chunks = [
        [(1, 10.0), (2, 5.0)],
        [(1, 2.5), (3, 1.0)],
        [(1, 4.0), (2, 0.5), (3, 9.0)],
    ]
    for i, rows in enumerate(chunks):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(
            rows, "user_id int, amount double"
        ).coalesce(1).write.parquet(stage)
        # the file-stream source lists FILES, not parquet output dirs
        shutil.copy(
            globmod.glob(f"{stage}/part-*.parquet")[0],
            str(src / f"c{i}.parquet"),
        )

    class RunningTotal(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getValueState(
                "agg", "n bigint, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["amount"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [int(key[0])], "n": [n], "total": [total]}
            )

        def close(self):
            pass

    stream = (
        spark.readStream.schema("user_id int, amount double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream.groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotal(),
            outputStructType="user_id int, n bigint, total double",
            outputMode="append",
            timeMode="none",
        )
        .writeStream.format("memory")
        .queryName("twstate_totals")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table("twstate_totals").toPandas()
    final = emitted.sort_values(["user_id", "n"]).groupby("user_id").last()
    all_rows = [r for c in chunks for r in c]
    for uid in {u for u, _ in all_rows}:
        amounts = [a for u, a in all_rows if u == uid]
        assert final.loc[uid, "n"] == len(amounts)
        assert abs(final.loc[uid, "total"] - sum(amounts)) < 1e-9
    assert (emitted.user_id == 1).sum() == 3  # state crossed batches
