"""The driver regenerates testdata between rounds and the events
timestamp physical type has drifted before (TIMESTAMP(NANOS) in one
vintage, plain micros TIMESTAMP_NTZ in another). Pin that both batch
and streaming readers adapt to either vintage and yield identical
event times."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TS = [
    dt.datetime(2024, 1, 1, 0, 0, 7, 179575),
    dt.datetime(2024, 1, 2, 12, 30, 0, 1),
    dt.datetime(2024, 1, 3, 23, 59, 59, 999999),
]


def _write_events(path: str, unit: str) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(TS, pa.timestamp(unit)),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, path, store_schema=False)


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_batch_reader_adapts(spark, tmp_path, unit):
    from sales_data_pipeline_spark.queries.base import events_table

    d = tmp_path / unit
    d.mkdir()
    _write_events(str(d / "events.parquet"), unit)
    got = sorted(
        r.ts.replace(tzinfo=None)
        for r in events_table(spark, str(d)).select("ts").collect()
    )
    assert got == TS


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_stream_reader_adapts(spark, tmp_path, unit):
    from pyspark.sql import functions as F

    from sales_data_pipeline_spark.streaming import ingest

    d = tmp_path / unit
    d.mkdir()
    _write_events(str(d / "events.parquet"), unit)
    agg = (
        ingest.read_events_stream(spark, str(d))
        .withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
    )
    out = ingest.run_available_now(agg, ingest.unique_sink_name(f"v_{unit}"))
    rows = out.collect()
    assert sum(r.n for r in rows) == len(TS)
    starts = sorted(r["window"].start.replace(tzinfo=None) for r in rows)
    assert starts[0] == dt.datetime(2024, 1, 1, 0, 0)


class TestThrottleHotKey:
    def test_hot_key_bounded_and_exact(self, spark):
        """SCALE.md hot-key posture: one user owning ~95% of the stream
        must neither blow memory (the fold streams Arrow batches with
        O(1) state per open key and a 10k-row output buffer) nor drift
        from the sequential reference replay. 60k events for the hot
        user across several Arrow batches exercises the
        state-carried-across-batches path; interleaved cold users
        exercise the key-boundary flush."""
        from sales_data_pipeline_spark.operators import timeseries

        gap = 1_000  # 1ms chain gap, many emits
        hot = [(7, 100 + i * 307) for i in range(60_000)]  # ~307us apart
        cold = [(u, 500 + i * 211) for u in (1, 2, 3) for i in range(50)]
        df = spark.createDataFrame(
            hot + cold, "user_id long, ts_us long"
        )
        out = {
            r.user_id: (r.n_events, r.n_emitted, r.first_emit_us,
                        r.last_emit_us)
            for r in timeseries.throttle_scan(
                df, gap_us=gap, num_partitions=4
            ).collect()
        }

        def replay(events):
            events = sorted(events)
            n_emit, first, last = 1, events[0], events[0]
            for t in events[1:]:
                if t >= last + gap:
                    n_emit += 1
                    last = t
            return (len(events), n_emit, first, last)

        assert out[7] == replay([t for _, t in hot])
        for u in (1, 2, 3):
            assert out[u] == replay([t for uu, t in cold if uu == u])
