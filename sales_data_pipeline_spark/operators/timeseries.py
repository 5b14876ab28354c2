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
    joined = lt.join(rt, ["_k", "_band"], "left").filter(
        F.col("_rsec").isNull()
        | (
            (F.col("_rsec") > F.col("_lsec") - width)
            & (F.col("_rsec") <= F.col("_lsec"))
        )
    )
    return (
        joined.groupBy(F.col("_k").alias(on), F.col("_lts").alias(left_ts))
        .agg(
            F.sum(F.when(F.col("_rsec").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_in_range")
        )
    )
