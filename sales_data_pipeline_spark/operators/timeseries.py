"""Time-series join operators Spark lacks natively: as-of join and
range (time-band) join, composed from built-ins.

As-of join — union-and-window, the standard distributed formulation:
tag both inputs, union, one window per key ordered by (ts, side) with
``last(value, ignoreNulls)`` carrying the most recent right-side row
forward, then keep left rows. ONE shuffle on the key (the window),
no join at all — this beats a sort-merge inequality join at any scale
and never materializes candidate pairs.

Range join — bucketize time into fixed-width bands and equi-join on
(key, band), probing each left row against its own and the preceding
band(s), then post-filter the exact interval. Turns an inequality join
(O(n*m) nested loop in naive engines) into an AQE-managed hash join
whose fan-out is bounded by ceil(range/width)+1 buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` and the same key (DuckDB/kdb ASOF
    semantics; ties include the equal-timestamp right row).

    Left columns pass through; right's timestamp and ``value_cols``
    arrive prefixed. Left rows with no prior right row keep NULLs.
    """
    vals = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lt = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in (on,)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in vals],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on],
        *[F.col(c).alias(f"_r_{c}") for c in vals],
        F.col(right_ts).alias("_r_ts"),
    )
    unioned = lt.unionByName(rt)
    # right rows (_side=0) sort before left at equal ts => ties attach
    w = (
        W.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last(F.col("_r_ts"), ignorenulls=True).over(w).alias(f"{prefix}ts"),
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in vals
        ],
    )
    keep = list(left.columns) + [f"{prefix}ts"] + [f"{prefix}{c}" for c in vals]
    return carried.filter(F.col("_side") == 1).select(*keep)


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: Column | None = None,
    lookback_seconds: int = 3600,
) -> DataFrame:
    """Count right rows per left row within (left.ts - lookback,
    left.ts]; same key. Bucketized: both sides hash into
    ``lookback_seconds``-wide epoch bands, the left side probes its own
    and the previous band (2 candidate buckets bound the fan-out), and
    the exact interval filters after the equi-join.
    """
    # microsecond arithmetic: unix_timestamp() truncates sub-second
    # parts and would shift interval edges vs exact engines. The
    # cast("timestamp") is a no-op for TIMESTAMP inputs and a
    # session-tz conversion for TIMESTAMP_NTZ. "Both sides shift by
    # the same offset" holds ONLY for a fixed-offset session timezone:
    # under a DST zone, values straddling a transition shift by
    # different offsets and band membership changes. The catalog pins
    # spark.sql.session.timeZone=UTC (queries/base.py) — a non-UTC
    # caller must pin a fixed-offset zone or pre-convert NTZ inputs
    # (to_utc_timestamp) before using this operator.
    width = lookback_seconds * 1_000_000
    lsec = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rsec = F.unix_micros(F.col(right_ts).cast("timestamp"))
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_lts"),
        lsec.alias("_lsec"),
        F.explode(
            F.array((lsec / width).cast("long"), (lsec / width).cast("long") - 1)
        ).alias("_band"),
    )
    rt = right.select(
        F.col(on).alias("_k"),
        rsec.alias("_rsec"),
        (rsec / width).cast("long").alias("_band"),
    )
    # The interval test lives in the AGGREGATE, not a post-join filter:
    # LEFT JOIN + WHERE would drop a left row entirely when its two
    # candidate buckets contain right rows but NONE inside the exact
    # interval (all its joined rows fail the filter and no NULL row
    # exists to preserve the group) — SQL's LEFT JOIN ... ON keeps such
    # rows with count 0. Surfaced by the sf0.1 full-catalog parity
    # sweep as a one-row undercount; a conditional count over the
    # unfiltered join is both correct and one operator cheaper.
    joined = lt.join(rt, ["_k", "_band"], "left")
    in_range = (F.col("_rsec") > F.col("_lsec") - width) & (
        F.col("_rsec") <= F.col("_lsec")
    )
    return (
        joined.groupBy(F.col("_k").alias(on), F.col("_lts").alias(left_ts))
        .agg(
            F.sum(F.when(in_range, 1).otherwise(0))
            .cast("long")
            .alias("n_in_range")
        )
    )


def throttle_scan(
    ev: DataFrame, gap_us: int, num_partitions: int
) -> DataFrame:
    """Per-key emit-then-suppress fold: the first event per user_id
    emits, then every event within ``gap_us`` of the LAST EMITTED one
    is suppressed, repeating down the timeline. Each decision depends
    on the prior decision — a sequential per-key chain no window
    function expresses (the alert-dedup / notification-rate-limit
    operator; batch twin of streaming transformWithState).

    Input: (user_id bigint, ts_us bigint). Output: one row per user
    with event/emit counts and first/last emit timestamps.

    Scale posture: hash-repartition on user_id + external
    sortWithinPartitions, then ONE mapInPandas scan per partition that
    carries the boundary user's state across Arrow batches. Memory is
    bounded under ANY key skew — the fold streams batches, holds 5
    integers of state for the open key, and flushes output every 10k
    rows; a user owning the whole partition costs sequential
    wall-clock on that task (inherent to order-dependent semantics),
    never heap. See SCALE.md "Known trade-offs"."""
    import pandas as pd

    cols = [
        "user_id", "n_events", "n_emitted", "first_emit_us", "last_emit_us"
    ]

    def scan(batches):
        # cur = [uid, n_events, n_emitted, first_emit_us, last_accept_us]
        cur: list | None = None
        rows: list[list[int]] = []
        for pdf in batches:
            us = pdf["user_id"].tolist()
            ts = pdf["ts_us"].tolist()
            for uid, t in zip(us, ts):
                if cur is None or uid != cur[0]:
                    if cur is not None:
                        rows.append(cur)
                    cur = [uid, 1, 1, t, t]
                else:
                    cur[1] += 1
                    if t >= cur[4] + gap_us:
                        cur[2] += 1
                        cur[4] = t
            if len(rows) >= 10000:
                yield pd.DataFrame(rows, columns=cols)
                rows = []
        if cur is not None:
            rows.append(cur)
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    out_schema = (
        "user_id bigint, n_events bigint, n_emitted bigint, "
        "first_emit_us bigint, last_emit_us bigint"
    )
    ordered = ev.repartition(num_partitions, "user_id").sortWithinPartitions(
        "user_id", "ts_us"
    )
    return ordered.mapInPandas(scan, out_schema)
