"""Post-hoc gold-layer audit (the reference's Airflow DAG checks,
Spark-first).

Reference: airflow/dags/sales_pipeline_dag.py:36-81 —
``check_gold_data_quality`` lists S3 objects and fails when a gold
prefix has no parquet files; ``log_pipeline_metrics`` counts rows by
downloading EVERY parquet file to the scheduler and reading it with
pyarrow (driver-side full read — unusable beyond toy scale).

Here: file presence via the Hadoop FS API (no boto3; works for any
scheme Spark can reach), row counts as a distributed ``count()`` —
footer-metadata-driven scans, no data to the driver beyond one scalar
per table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from sales_data_pipeline_spark.io.fs import _fs


@dataclass
class GoldAudit:
    """Per-table audit results; ``passed`` mirrors the DAG's gate."""

    file_counts: dict[str, int] = field(default_factory=dict)
    row_counts: dict[str, int] = field(default_factory=dict)
    failures: list[str] = field(default_factory=list)

    @property
    def passed(self) -> bool:
        return not self.failures


def _count_parquet_files(spark: SparkSession, path: str) -> int:
    """Recursive .parquet file count under a prefix (partitioned
    layouts nest year=/month= dirs, so a flat listing undercounts)."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return 0
    n = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        status = it.next()
        if status.getPath().getName().endswith(".parquet"):
            n += 1
    return n


def audit_gold_outputs(
    spark: SparkSession,
    output_root: str,
    tables: dict[str, int] | None = None,
) -> GoldAudit:
    """Check each gold table has >= min parquet files and count rows.

    ``tables`` maps table subpath -> minimum file count (default: the
    DAG's two gold tables at >= 1 file each,
    sales_pipeline_dag.py:46-55).
    """
    if tables is None:
        tables = {"gold/sales_enriched": 1, "gold/customer_metrics": 1}
    out = output_root.rstrip("/")
    audit = GoldAudit()
    for sub, min_files in tables.items():
        path = f"{out}/{sub}"
        n_files = _count_parquet_files(spark, path)
        audit.file_counts[sub] = n_files
        if n_files < min_files:
            audit.failures.append(
                f"{sub}: expected >= {min_files} parquet file(s), "
                f"found {n_files}"
            )
            audit.row_counts[sub] = 0
            continue
        audit.row_counts[sub] = spark.read.parquet(path).count()
    return audit
