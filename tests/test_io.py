"""IO layer tests: readers/writers round-trips and the Hadoop-FS
utility module (S1-S9)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from sales_data_pipeline_spark.io import fs, readers, writers


def test_csv_reader_schema_locked(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,price,label\n1,2.5,a\n2,bad,b\n")
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("label", T.StringType()),
        ]
    )
    df = readers.read_csv(spark, str(p), schema)
    rows = {r.id: r for r in df.collect()}
    assert rows[1].price == 2.5
    assert rows[2].price is None  # contract schema nulls bad cells
    assert df.schema == schema


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 2024, 10.0), (2, 2025, 20.0)], "id int, yr int, v double"
    )
    out = str(tmp_path / "t")
    writers.write_parquet(df, out, partition_cols=["yr"], coalesce_files=1)
    assert os.path.isdir(f"{out}/yr=2024")
    back = readers.read_parquet(spark, out, "yr = 2024")
    assert [r.id for r in back.collect()] == [1]


def test_generic_format_writer(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    out = str(tmp_path / "csvout")
    writers.write_format(df, out, fmt="csv", options={"header": "true"})
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert files
    with open(os.path.join(out, files[0])) as f:
        assert f.read().startswith("id,s")


def test_fs_utilities(spark, tmp_path):
    d = tmp_path / "stage"
    d.mkdir()
    (d / "a.csv").write_text("x")
    (d / "b.txt").write_text("y")
    base = f"file://{d}"
    listed = fs.list_files(spark, base, suffix=".csv")
    assert len(listed) == 1 and listed[0].endswith("a.csv")
    assert fs.exists(spark, f"{base}/a.csv")
    assert fs.move(spark, f"{base}/a.csv", f"{base}/processed/a.csv")
    assert fs.exists(spark, f"{base}/processed/a.csv")
    assert not fs.exists(spark, f"{base}/a.csv")
    assert fs.delete(spark, f"{base}/processed", recursive=True)
    assert not fs.exists(spark, f"{base}/processed")
    assert fs.list_files(spark, f"{base}/nope") == []


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key => the equi-join plan has NO
    Exchange (the shuffle was paid once at write time)."""
    from pyspark.sql import functions as F

    from sales_data_pipeline_spark.io import writers

    sf = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    writers.write_bucketed(
        o, "t_orders_bkt", str(tmp_path / "ob"), 8, ["o_orderkey"],
        sort_cols=["o_orderkey"],
    )
    writers.write_bucketed(
        li, "t_lineitem_bkt", str(tmp_path / "lb"), 8, ["l_orderkey"],
        sort_cols=["l_orderkey"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_orders_bkt").join(
            spark.table("t_lineitem_bkt"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_bkt")


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """A filter on a Hive partition column must become a
    PartitionFilter (directory pruning — the scan never lists the
    other partitions), not a row-level predicate. This is the layout
    contract that makes the reference's partitionBy(sales_year,
    sales_month) scheme pay off at 100 TB."""
    from pyspark.sql import functions as F

    from sales_data_pipeline_spark.io import writers

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = str(tmp_path / "part_pruned")
    writers.write_parquet(
        li.withColumn("yr", F.year("l_shipdate")),
        out,
        partition_cols=["yr"],
    )
    df = spark.read.parquet(out).filter(F.col("yr") == 1996)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(yr" in plan
    assert "(yr" in plan.split("PartitionFilters")[1][:80]
    # the partition predicate must NOT appear as a pushed data filter
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "yr" not in pushed


class TestMalformedCsvPolicy:
    CSV = "id,price\n1,9.50\n2,notanumber\n3,4.25\n"

    def _schema(self):
        from pyspark.sql import types as T

        return T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("price", T.DoubleType()),
            ]
        )

    def test_permissive_quarantines_raw_line(self, spark, tmp_path):
        from sales_data_pipeline_spark.io import readers

        p = tmp_path / "dirty.csv"
        p.write_text(self.CSV)
        df = readers.read_csv(
            spark, str(p), self._schema(), corrupt_record_col="_raw"
        )
        rows = {r.id: r for r in df.collect()}
        assert rows[2].price is None  # unparseable field nulls out
        assert rows[2]._raw == "2,notanumber"  # raw line captured
        assert rows[1]._raw is None and rows[1].price == 9.50

    def test_dropmalformed_drops(self, spark, tmp_path):
        from sales_data_pipeline_spark.io import readers

        p = tmp_path / "dirty.csv"
        p.write_text(self.CSV)
        df = readers.read_csv(
            spark, str(p), self._schema(), mode="DROPMALFORMED"
        )
        assert sorted(r.id for r in df.collect()) == [1, 3]

    def test_failfast_raises(self, spark, tmp_path):
        from sales_data_pipeline_spark.io import readers

        p = tmp_path / "dirty.csv"
        p.write_text(self.CSV)
        df = readers.read_csv(spark, str(p), self._schema(), mode="FAILFAST")
        with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
            df.collect()


def test_max_records_per_file_bounds_output_files(spark, tmp_path):
    """Output-file sizing is the flip side of small-file control: a
    100 TB write needs BOTH a floor (coalesce_files) and a ceiling
    (maxRecordsPerFile prevents one giant task output)."""
    out = str(tmp_path / "sized")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    (
        li.repartition(1)
        .write.option("maxRecordsPerFile", 1000)
        .mode("overwrite")
        .parquet(out)
    )
    import glob

    files = glob.glob(f"{out}/*.parquet")
    n = li.count()
    assert len(files) >= n // 1000  # one task still splits its output


def test_parquet_merge_schema_across_epochs(spark, tmp_path):
    """Schema evolution on the lake itself: epoch directories written
    before and after a column add read back as ONE table with
    mergeSchema, old rows null-padded — no history rewrite."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "lake")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    o.select("o_orderkey", "o_totalprice").write.parquet(f"{out}/epoch=1")
    o.select("o_orderkey", "o_totalprice", "o_orderpriority").write.parquet(
        f"{out}/epoch=2"
    )
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert "o_orderpriority" in merged.columns
    n = o.count()
    assert merged.count() == 2 * n
    assert merged.filter(F.col("o_orderpriority").isNull()).count() == n


def test_range_clustered_write_enables_file_skipping(spark, tmp_path):
    """Range-clustering a table on its habitual filter key before the
    write (repartitionByRange + sortWithinPartitions) gives every file
    a narrow, mutually disjoint min/max envelope on that key — the
    layout property parquet row-group/file skipping needs. Without it,
    every file spans the whole key range and no filter can skip
    anything. Asserted directly on the parquet footers."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "clustered")
    (
        ev.repartitionByRange(4, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(out)
    )
    import glob

    envelopes = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        meta = pq.ParquetFile(f).metadata
        idx = [
            i
            for i in range(meta.num_columns)
            if meta.row_group(0).column(i).path_in_schema == "user_id"
        ][0]
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        envelopes.append((min(mins), max(maxs)))
    envelopes.sort()
    # disjoint (or touching) envelopes: each file covers its own slice
    for (lo1, hi1), (lo2, hi2) in zip(envelopes, envelopes[1:]):
        assert hi1 <= lo2, envelopes
    # and the clustered copy still answers queries correctly
    probe = envelopes[0][1]
    got = spark.read.parquet(out).filter(F.col("user_id") == probe).count()
    want = ev.filter(F.col("user_id") == probe).count()
    assert got == want > 0


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """S4/S8 exercised end-to-end against embedded Derby (already on
    Spark's classpath for the Hive metastore — no external DB needed;
    reference: src/main/read/database_read.py:7-9,
    src/main/write/database_write.py:11-14). Covers the parallel
    range-partitioned read path too: partitionColumn splits the scan
    into multiple JDBC partitions."""
    url = f"jdbc:derby:{tmp_path}/rt_db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    src = spark.range(0, 100).selectExpr(
        "id", "CAST(id % 7 AS DOUBLE) AS val", "CONCAT('c', id % 3) AS cat"
    )
    writers.write_jdbc(src, url, "t_roundtrip", mode="overwrite",
                       properties=props)

    back = readers.read_jdbc(spark, url, "t_roundtrip", properties=props)
    assert back.count() == 100
    assert {c.lower() for c in back.columns} == {"id", "val", "cat"}
    assert back.agg({"val": "sum"}).first()[0] == src.agg(
        {"val": "sum"}
    ).first()[0]

    # parallel read: 4 range partitions over id
    par = readers.read_jdbc(
        spark, url, "t_roundtrip", properties=props,
        partition_column="id", lower_bound=0, upper_bound=100,
        num_partitions=4,
    )
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == 100

    # append mode accumulates
    writers.write_jdbc(src.limit(5), url, "t_roundtrip", mode="append",
                       properties=props)
    assert readers.read_jdbc(spark, url, "t_roundtrip",
                             properties=props).count() == 105


def test_json_reader_schema_locked_quarantine(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "price": 2.5, "label": "a"}\n'
        'not json at all\n'
        '{"id": 3, "price": 9.0, "label": "c"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("label", T.StringType()),
        ]
    )
    df = readers.read_json(
        spark, str(p), schema, corrupt_record_col="_raw"
    )
    rows = sorted(df.collect(), key=lambda r: (r.id is None, r.id))
    assert [r.id for r in rows] == [1, 3, None]
    assert rows[2]._raw == "not json at all"  # quarantine keeps source
    # pushdown-style filter applies post-parse
    assert (
        readers.read_json(spark, str(p), schema, filter_condition="price > 5")
        .count()
        == 1
    )


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    src = spark.range(100).selectExpr(
        "id", "id % 7 AS bucket", "CAST(id * 1.5 AS DOUBLE) AS v"
    )
    path = str(tmp_path / "orc_out")
    writers.write_format(src, path, fmt="orc", options={})
    back = readers.read_orc(spark, path, filter_condition="bucket = 3")
    assert back.count() == src.filter("id % 7 = 3").count()
    # filter reaches the ORC scan (stripe pruning at scale)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "orc" in plan.lower()
    # nullability flags relax on round-trip; names+types must hold
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in src.schema.fields
    ]


def test_zordered_write_prunes_both_dimensions(spark, tmp_path):
    """Z-order clustering on (user_id, event_id) must give every file a
    narrow min/max envelope on BOTH keys. Single-key range clustering
    (the previous test) prunes only its own key — the other dimension
    spans the whole range in every file. Asserted on parquet footers:
    per-file span on each dimension stays well under the global span."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    out = str(tmp_path / "zorder")
    writers.write_zordered(ev, out, "user_id", "event_id", files=8)

    def spans(col):
        spans = []
        glo, ghi = None, None
        for f in glob.glob(f"{out}/part-*.parquet"):
            meta = pq.ParquetFile(f).metadata
            idx = [
                i
                for i in range(meta.num_columns)
                if meta.row_group(0).column(i).path_in_schema == col
            ][0]
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            lo, hi = min(mins), max(maxs)
            spans.append(hi - lo)
            glo = lo if glo is None else min(glo, lo)
            ghi = hi if ghi is None else max(ghi, hi)
        return spans, ghi - glo

    for col in ("user_id", "event_id"):
        file_spans, total = spans(col)
        assert len(file_spans) >= 4
        # every file covers a strict sub-range of BOTH dimensions
        avg = sum(file_spans) / len(file_spans)
        assert avg <= 0.62 * total, (col, file_spans, total)

    # layout is a pure reorder: content identical
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert (
        back.agg(F.sum("user_id"), F.sum("event_id")).collect()
        == ev.agg(F.sum("user_id"), F.sum("event_id")).collect()
    )
