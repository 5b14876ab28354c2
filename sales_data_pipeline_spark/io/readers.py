"""Source operators (SURVEY §2.1 S1-S4, S10).

Reference parity with one deliberate change: every scan takes an
EXPLICIT schema (the reference's inferSchema makes types data-dependent,
/root/reference/src/main/read/read_csv.py:28-33; SURVEY §7.4 risk 4).

Scale notes:
 - CSV can't push filters to storage; the reference comments this
   itself (read_csv.py:38-40). Parquet scans get row-group pruning +
   partition pruning for free, which is why every layer past bronze is
   parquet.
 - The incremental filter is applied as a typed Column when possible
   (predicate pushdown), with the reference's SQL-string form accepted
   too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    filter_condition: str | Column | None = None,
    header: bool = True,
    mode: str = "PERMISSIVE",
    corrupt_record_col: str | None = None,
) -> DataFrame:
    """CSV scan with contract schema (S1) + optional incremental filter
    (S2, from WatermarkManager.get_filter_condition/_column).

    ``mode`` is Spark's malformed-row policy: PERMISSIVE (default —
    unparseable fields null out; pass ``corrupt_record_col`` to also
    capture the raw line for a quarantine sink), DROPMALFORMED, or
    FAILFAST. At 100 TB PERMISSIVE + quarantine is the only sane
    posture: one bad row must neither kill the job nor vanish
    silently — it lands in bronze/rejected with its source text.
    """
    reader = spark.read.option("header", str(header).lower()).option(
        "mode", mode
    )
    if corrupt_record_col is not None:
        schema = T.StructType(
            schema.fields
            + [T.StructField(corrupt_record_col, T.StringType(), True)]
        )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_record_col)
    df = reader.schema(schema).csv(path)
    if filter_condition is not None:
        df = df.filter(filter_condition)
    return df


def read_parquet(
    spark: SparkSession,
    path: str,
    filter_condition: str | Column | None = None,
) -> DataFrame:
    """Parquet scan (S3/S10) — partition discovery + pruning native;
    filters push down to row-group min/max."""
    df = spark.read.parquet(path)
    if filter_condition is not None:
        df = df.filter(filter_condition)
    return df


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """JDBC scan (S4; reference: src/main/read/database_read.py:1-9).

    The reference reads single-threaded; here parallel range-partitioned
    reads are first-class — at scale a JDBC scan without
    partition_column is a single-task bottleneck.
    """
    reader = spark.read.format("jdbc").option("url", url).option(
        "dbtable", table
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    filter_condition: str | Column | None = None,
    multiline: bool = False,
    mode: str = "PERMISSIVE",
    corrupt_record_col: str | None = None,
) -> DataFrame:
    """JSON-lines scan with contract schema. Schema is REQUIRED: Spark's
    JSON inference is a full extra pass over the input — at 100 TB that
    doubles the scan before the job starts. Like read_csv, PERMISSIVE +
    a corrupt-record column is the quarantine-friendly posture; JSONL
    (multiline=False) is splittable, multiline JSON is one task per
    file — keep it for small config-ish inputs only."""
    reader = (
        spark.read.option("multiLine", str(multiline).lower())
        .option("mode", mode)
    )
    if corrupt_record_col is not None:
        schema = T.StructType(
            schema.fields
            + [T.StructField(corrupt_record_col, T.StringType(), True)]
        )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_record_col)
    df = reader.schema(schema).json(path)
    if filter_condition is not None:
        df = df.filter(filter_condition)
    return df


def read_orc(
    spark: SparkSession,
    path: str,
    filter_condition: str | Column | None = None,
) -> DataFrame:
    """ORC scan — same columnar contract as parquet (stripe-level
    min/max pruning, filter pushdown, column projection) for corpora
    that arrive ORC-encoded (Hive-era lakes)."""
    df = spark.read.orc(path)
    if filter_condition is not None:
        df = df.filter(filter_condition)
    return df
