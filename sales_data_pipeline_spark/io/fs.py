"""Object-store / filesystem utility layer (SURVEY §2.1 S9).

The reference wraps boto3 for list/download/upload/move/delete
(/root/reference/src/main/read/aws_read.py, download/aws_file_download.py,
upload/upload_to_s3.py, move/move_files.py, delete/aws_delete.py,
delete/local_file_delete.py). These are NOT query operators — they stage
raw files around the engine — so this engine keeps them as one thin
module over the Hadoop FileSystem API via the JVM gateway: the SAME code
path works for file://, hdfs://, and s3a:// URIs (credentials/config
come from Spark's Hadoop conf), which is what a cluster deployment
actually needs instead of a second, boto3-shaped client.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    return hadoop_path.getFileSystem(jsc.hadoopConfiguration()), hadoop_path


def list_files(
    spark: SparkSession, path: str, suffix: str | None = None
) -> list[str]:
    """List file paths under a prefix (aws_read.py:7-22 semantics:
    optional suffix filter, files only)."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return []
    out = []
    for status in fs.listStatus(p):
        if status.isFile():
            name = status.getPath().toString()
            if suffix is None or name.endswith(suffix):
                out.append(name)
    return sorted(out)


def move(spark: SparkSession, src: str, dst: str) -> bool:
    """Move/rename within a filesystem (move_files.py:26-62 — the
    reference copies+deletes across buckets; Hadoop rename covers the
    same-store case, and DistCp-style copy belongs to ops tooling)."""
    fs, sp = _fs(spark, src)
    _, dp = _fs(spark, dst)
    parent = dp.getParent()
    if parent is not None and not fs.exists(parent):
        fs.mkdirs(parent)
    return bool(fs.rename(sp, dp))


def delete(spark: SparkSession, path: str, recursive: bool = False) -> bool:
    """Delete a file or directory (aws_delete.py / local_file_delete.py)."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, recursive))


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.exists(p))
