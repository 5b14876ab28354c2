"""Structured Streaming surface.

The reference's only "streaming" is micro-batch-by-rerun with a
watermark filter (SURVEY §2.8); this module is the idiomatic upgrade:
``readStream`` file sources + event-time windows + ``withWatermark``
late-data handling + ``Trigger.AvailableNow`` for batch-equivalent
incremental runs (the streaming twin of WatermarkManager's buffer).

Scale posture: file-stream ingest tracks processed files in the
checkpoint (exactly-once); windowed aggregations shuffle once on
(window, keys); state store size is bounded by the watermark horizon.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hadoop_is_dir(spark: SparkSession, path: str) -> bool:
    """Directory test through the Hadoop FileSystem API so it answers
    correctly for any scheme a cluster mounts (s3a/gs/abfs/hdfs/file),
    not just local paths."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.isDirectory(hpath))


# Per-path probe caches (round-13): the stream reader's batch-schema
# read and the adaptive-partition row count each cost a datasource
# resolution (~100 ms of driver work) or a metadata job, and every
# streaming query pays them on every invocation. Keyed on (path,
# mtime) like queries/base.py's table cache, so regenerated testdata
# misses. Values are plain schemas/ints — no plan or data is reused.
_SCHEMA_CACHE: dict[tuple[str, int], object] = {}
_ROWS_CACHE: dict[tuple[str, int], int] = {}


def _path_mtime(path: str) -> int:
    import os

    try:
        return os.stat(path).st_mtime_ns
    except OSError:
        return -1


def _events_batch_schema(spark: SparkSession, events_path: str):
    key = (events_path, _path_mtime(events_path))
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        schema = spark.read.parquet(events_path).schema
        _SCHEMA_CACHE[key] = schema
    return schema


def adaptive_state_partitions(
    spark: SparkSession,
    sf_dir: str,
    rows_per_partition: int = 30_000,
) -> int:
    """Data-adaptive shuffle-partition count for the compute-bound
    stateful Python operators (sessionizer, throttler): one state-store
    instance + one Python worker per partition is pure setup cost until
    each partition carries enough rows to amortize it. Measured at
    sf0.1 (100k events): 8 partitions ran the throttle ~3x faster than
    32 (6.5 s vs 20.5 s warm — 32 RocksDB/GroupState instances for 3k
    rows each); at sf1 (1M events) the sessionizer measured 9.5 s at
    core-count partitions vs 20.0 s at 8 (the r4 A/B) — so the right
    value SCALES WITH THE DATA: ceil(rows / rows_per_partition),
    floored at DEFAULT_STATE_PARTITIONS, capped at core count. The
    row count probes the events table's parquet metadata once per
    (path, mtime). Partitioning never changes per-key state semantics,
    so results are unaffected at any value."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events_path = f"{sf_dir}/events.parquet"
    key = (events_path, _path_mtime(events_path))
    rows = _ROWS_CACHE.get(key)
    if rows is None:
        rows = spark.read.parquet(events_path).count()
        _ROWS_CACHE[key] = rows
    n = spark.sparkContext.defaultParallelism
    return max(
        DEFAULT_STATE_PARTITIONS,
        min(n, -(-rows // rows_per_partition)),
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet. The stream schema is
    taken from a batch read of the same file, so the reader adapts to
    either testdata vintage — TIMESTAMP(NANOS) (arrives as long under
    nanosAsLong, converted to micros here, matching the batch reader in
    queries/base.py) or plain micros TIMESTAMP/TIMESTAMP_NTZ (passes
    through).

    Layout dual-path (round-6 fix): the driver testdata ships events
    as a SINGLE FILE `events.parquet`, which a file stream can only
    reach by loading the parent dir with a pathGlobFilter (the source
    requires its basePath to be a directory). Spark-written tables
    (tools/scale_data.py's /tmp/sf1, any real deployment) are
    DIRECTORIES `events.parquet/part-*.parquet`, where that same leaf
    glob matches nothing — the stream silently listed ZERO files and
    every streaming query returned empty at sf1. Directories load
    directly."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events_path = f"{sf_dir}/events.parquet"
    batch_schema = _events_batch_schema(spark, events_path)
    reader = spark.readStream.schema(batch_schema).format("parquet")
    if _hadoop_is_dir(spark, events_path):
        raw = reader.load(events_path)
    else:
        raw = reader.option("pathGlobFilter", "events.parquet").load(sf_dir)
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        # withWatermark only accepts TIMESTAMP; the session tz is pinned
        # to UTC (queries/base.py) so this cast is deterministic
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Tumbling event-time window counts+sums per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "value_cents"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            (F.col("value_cents") / 100.0).alias("total_value"),
        )
    )


def sliding_agg(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "30 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Sliding event-time windows (each event lands in window/slide
    overlapping windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
    )


DEFAULT_STATE_PARTITIONS = 8


@contextmanager
def bounded_state_partitions(
    spark: SparkSession,
    n: int = DEFAULT_STATE_PARTITIONS,
    large_state: bool = True,
):
    """Scope ``spark.sql.shuffle.partitions`` to a streaming run.

    Every stateful streaming operator materializes one state-store
    instance PER shuffle partition PER micro-batch; under a vanilla
    session (Spark default: 200) that fixed setup cost dominates
    bounded batches — measured 26.4 s for streaming_stream_join at
    sf0.01 with 200 partitions vs 3.1 s with 8, identical results.
    The external driver runs the catalog on exactly such a vanilla
    session, so streaming queries pin a bounded state partitioning
    themselves. A stream executes ENTIRELY inside its query fn
    (Trigger.AvailableNow + awaitTermination), so the conf can be
    scoped and restored without leaking into later catalog queries.
    On a real cluster the right value scales with executor count —
    this is the knob, not a constant to inline.

    ``large_state=True`` (default) additionally pins the RocksDB
    state-store provider: the default HDFSBackedStateStoreProvider
    holds each partition's state in a heap hashmap, so any operator
    whose state grows with the data — dropDuplicates keyed on event id
    (state = every distinct key), a stream-stream join's
    watermark-horizon buffer, per-user session state — eventually OOMs
    the executor (seen at the 100x spot-check: Java-heap OOM loading
    the dedup state store, which then poisons the whole JVM). RocksDB
    keeps state off-heap with disk spill — bounded memory at ANY state
    size, and the provider every production large-state deployment
    runs. It costs ~1-3 s of per-run store setup, so operators whose
    state is BOUNDED regardless of data volume (windowed aggregates:
    state = windows x groups; small-key aggregations) pass
    ``large_state=False`` and keep the cheaper heap store. Scoped +
    restored like the partition conf so batch catalog queries are
    untouched."""
    keys = {"spark.sql.shuffle.partitions": str(n)}
    if large_state:
        keys[
            "spark.sql.streaming.stateStore.providerClass"
        ] = (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
    prev: dict[str, str | None] = {}
    for key, val in keys.items():
        try:
            prev[key] = spark.conf.get(key)
        except Exception:
            prev[key] = None
        spark.conf.set(key, val)
    try:
        yield
    finally:
        for key, old in prev.items():
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)


def run_available_now(
    stream_df: DataFrame, name: str, large_state: bool = False
) -> DataFrame:
    """Execute a streaming aggregation over all currently-available
    input (Trigger.AvailableNow) into a memory sink; returns the final
    result as a batch DataFrame. Complete output mode: every window is
    emitted regardless of watermark position at end-of-input.
    ``large_state``: see bounded_state_partitions — pass True when the
    plan holds data-scaling state (dedup keys), leave False for
    window/group-bounded aggregation state."""
    spark = stream_df.sparkSession
    with bounded_state_partitions(spark, large_state=large_state):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


_COUNTER = {"n": 0}


def unique_sink_name(prefix: str) -> str:
    _COUNTER["n"] += 1
    return f"{prefix}_{_COUNTER['n']}"


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    watermark: str = "5 minutes",
    horizon: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: rows of ``left`` matched to
    ``right`` rows of the same user arriving within ``horizon`` after
    them. Both sides carry watermarks and the join condition bounds
    event time in both directions, so Spark can expire buffered state
    once the watermark passes each row's match horizon — state is
    O(input rate x horizon), not O(stream length). Inner joins emit a
    pair the moment both sides arrive (no watermark holdback), so the
    AvailableNow end state equals the batch join — oracle-checkable.

    ``how="left_outer"`` additionally emits each unmatched left row
    (right columns NULL) once the watermark passes its match horizon —
    i.e. only when no match can ever arrive. Left rows whose horizon is
    still inside the final watermark remain in state, so the
    AvailableNow end state equals the batch left join MINUS that tail
    (the oracle encodes the eviction rule explicitly).
    """
    lw = left.withWatermark("l_ts", watermark)
    rw = right.withWatermark("r_ts", watermark)
    return lw.join(
        rw,
        F.expr(
            "l_user_id = r_user_id AND r_ts > l_ts "
            f"AND r_ts <= l_ts + INTERVAL {horizon}"
        ),
        how,
    )
