#!/usr/bin/env python
"""Materialize a K× scale-up of a driver testdata dir (default: sf0.1 ->
/tmp/sf1, K=10) for scale spot-checks of the most expensive queries.

    python tools/scale_data.py [--src /root/testdata/sf0.1] \
        [--dst /tmp/sf1] [--factor 10]

Replication strategy — every replica r shifts ALL surrogate keys by
r * 8_400_000 (>= any sf0.1 key; divisible by 840 = lcm(1..8) and by
70, so the doc_id % 10 / % 7 corpus-injection mods and any small-mod
bucketing keep their per-replica distribution EXACTLY equal to
sf0.1's). Foreign keys shift together, so join fan-outs, group
cardinalities and per-key row counts all scale the way organic data
would: K× rows AND K× distinct keys.

Text/embedding payloads are perturbed per replica (word-level suffix /
hash-noise) so dedup and ANN workloads don't degenerate into K-sized
exact-duplicate clusters that no organic 10× corpus would have.
nation/region stay fixed (TPC-H semantics).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

OFF = 8_400_000


def _shift(df: DataFrame, r: int, *cols: str) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.col(c) + F.lit(r * OFF))
    return df


def _suffix(df: DataFrame, r: int, *cols: str) -> DataFrame:
    if r == 0:
        return df
    for c in cols:
        df = df.withColumn(c, F.concat(F.col(c), F.lit(f" r{r}")))
    return df


def _replica(spark, src, table: str, r: int) -> DataFrame:
    from sales_data_pipeline_spark.queries.base import events_table

    if table == "events":
        df = events_table(spark, src)  # nanos-safe read
        return _shift(df, r, "event_id", "user_id")
    df = spark.read.parquet(f"{src}/{table}.parquet")
    if table in ("region", "nation"):
        return df
    if table == "customer":
        return _suffix(_shift(df, r, "c_custkey"), r, "c_name")
    if table == "supplier":
        return _suffix(_shift(df, r, "s_suppkey"), r, "s_name")
    if table == "part":
        # suffix at the END keeps LIKE 'prefix%' selectivity intact
        return _suffix(_shift(df, r, "p_partkey"), r, "p_name")
    if table == "orders":
        return _shift(df, r, "o_orderkey", "o_custkey")
    if table == "lineitem":
        return _shift(df, r, "l_orderkey", "l_partkey", "l_suppkey")
    if table == "documents":
        df = _shift(df, r, "doc_id")
        if r > 0:
            # change EVERY word: no shingle survives across replicas,
            # so near-dup structure per replica mirrors sf0.1 instead
            # of every doc acquiring K near-copies
            df = df.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.lit(f"_{r}")),
                    ),
                    " ",
                ),
            )
        return df.withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings":
        df = _shift(df, r, "vec_id")
        if r > 0:
            # deterministic per-(vector, component, replica) noise keeps
            # replicas geometrically distinct for ANN workloads
            df = df.withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda x, i: (
                        x
                        + (
                            F.pmod(
                                F.xxhash64(
                                    F.col("vec_id") * 4099 + i, F.lit(r)
                                ),
                                F.lit(1000),
                            ).cast("double")
                            / 500.0
                            - 1.0
                        )
                        * 0.01
                    ).cast("float"),
                ),
            )
        return df
    raise ValueError(table)


TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    from sales_data_pipeline_spark.session import build_session

    spark = build_session("scale-data")
    os.makedirs(args.dst, exist_ok=True)
    for t in TABLES:
        if t in ("region", "nation"):
            out = _replica(spark, args.src, t, 0)
        else:
            out = functools.reduce(
                DataFrame.unionByName,
                [_replica(spark, args.src, t, r) for r in range(args.factor)],
            )
        out.write.mode("overwrite").parquet(f"{args.dst}/{t}.parquet")
        print(f"{t}: {spark.read.parquet(f'{args.dst}/{t}.parquet').count()}")
    spark.stop()


if __name__ == "__main__":
    main()
