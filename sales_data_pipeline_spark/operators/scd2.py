"""SCD Type 2 merge — distributed re-implementation of the reference's
flagship algorithm (/root/reference/src/main/transformations/
scd_customer_transform.py:66-206).

Semantics reproduced exactly (golden-tested):
 1. Incoming rows stamped valid_from=as_of, valid_to=NULL,
    is_current=True, row_hash=md5(concat_ws('|', tracked_cols)) —
    concat_ws SKIPS nulls, so a NULL tracked column collapses
    (('a',NULL,'b') hashes like ('a','b')); this is part of the hash
    contract (scd_customer_transform.py:59-62).
 2. First run (existing lacks is_current) initializes existing the same
    way (:100-107).
 3. CHANGED keys: inner join incoming<->current-existing on the business
    key where hashes differ (:115-127).
 4. Close old: for changed keys, rows that were current get
    is_current=False; then valid_to=as_of is applied where is_current is
    (now) False AND valid_to IS NULL — the reference's two-step `when`
    dance (:136-151), which also back-fills valid_to on anomalous
    already-closed-but-open-ended rows of changed keys. Reproduced
    faithfully.
 5. NEW keys: left_anti vs existing ids (:158-163). New versions of
    changed keys: filter by changed ids (:168-173).
 6. Result = existing_updated UNION new UNION changed_new over the fixed
    column contract (:179-204). Unchanged + deleted keys pass through.

Engine upgrade (results identical, scale-safe): the reference pulls
changed ids to the driver (`collect()` at :129) and filters with
`isin(list)` — O(changed) driver memory and a plan literal. Here changed
keys stay a DataFrame: closing uses a broadcast LEFT JOIN marker, new
versions use LEFT SEMI. At 100 TB the changed-key set can itself be
huge; semi/left joins shuffle-or-broadcast as AQE decides, the driver
holds nothing.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sales_data_pipeline_spark.caching import scoped_persist
from sales_data_pipeline_spark.schemas import SCD2_TRACKED_COLUMNS

SCD_COLS = ["valid_from", "valid_to", "is_current", "row_hash"]


def row_hash(tracked_cols: list[str]) -> F.Column:
    return F.md5(F.concat_ws("|", *[F.col(c) for c in tracked_cols]))


def add_scd_columns(
    df: DataFrame,
    as_of_date: dt.date | str,
    tracked_cols: list[str],
) -> DataFrame:
    """Stamp SCD bookkeeping columns (scd_customer_transform.py:44-63).
    One select, not a withColumn chain — each withColumn re-analyzes
    the growing plan driver-side (round-13 build-cost finding)."""
    return df.select(
        "*",
        F.lit(str(as_of_date)).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).cast("boolean").alias("is_current"),
        row_hash(tracked_cols).alias("row_hash"),
    )


def apply_scd_type2(
    existing_df: DataFrame,
    new_df: DataFrame,
    as_of_date: dt.date | str,
    business_key: str = "customer_id",
    tracked_cols: list[str] | None = None,
    output_cols: list[str] | None = None,
    cache_inputs: bool = True,
) -> DataFrame:
    """Merge an incoming batch into SCD2 history. See module docstring.

    Both inputs feed 2-3 branches of the output plan (change join, key
    anti-join, pass-through union); without materialization each branch
    re-reads and re-hashes the full input. ``cache_inputs`` persists
    them MEMORY_AND_DISK (spill-safe at scale) — on a cluster prefer
    writing the merged history to storage and re-reading, which this
    flag approximates in one job.
    """
    tracked = tracked_cols or SCD2_TRACKED_COLUMNS
    as_of = F.lit(str(as_of_date)).cast("date")

    new_with_scd = add_scd_columns(new_df, as_of_date, tracked)
    if "is_current" not in existing_df.columns:
        existing_with_scd = add_scd_columns(existing_df, as_of_date, tracked)
    else:
        existing_with_scd = existing_df
    if cache_inputs:
        # scoped: both inputs feed multiple merge branches; released by
        # the caller loop (bench/harness) right after the action, or by
        # the next catalog query's entry
        new_with_scd = scoped_persist(new_with_scd)
        existing_with_scd = scoped_persist(existing_with_scd)

    # ---- changed keys: hash differs vs the CURRENT existing version ----
    current_records = existing_with_scd.filter(F.col("is_current"))
    changed_keys = (
        new_with_scd.alias("new")
        .join(current_records.alias("old"), on=business_key, how="inner")
        .filter(F.col("new.row_hash") != F.col("old.row_hash"))
        .select(business_key)
        .distinct()
    )

    # ---- close old versions (distributed marker join, not isin-list) ----
    marker = changed_keys.withColumn("_changed", F.lit(True))
    joined = existing_with_scd.join(marker, on=business_key, how="left")
    is_changed = F.coalesce(F.col("_changed"), F.lit(False))
    # step 1 (reference :136-143): flip is_current for changed+current rows
    closed_current = F.when(
        is_changed & F.col("is_current"), F.lit(False)
    ).otherwise(F.col("is_current"))
    # step 2 (reference :145-151): evaluated AFTER step 1 — valid_to set
    # where is_current is NOW (post-step-1) False and valid_to is still
    # NULL; one select with the step-1 expression inlined (identical
    # evaluation order, no per-withColumn re-analysis)
    keep = [
        c
        for c in existing_with_scd.columns
        if c not in ("is_current", "valid_to")
    ]
    existing_updated = joined.select(
        *keep,
        closed_current.alias("is_current"),
        F.when(
            is_changed & ~closed_current & F.col("valid_to").isNull(),
            as_of,
        )
        .otherwise(F.col("valid_to"))
        .alias("valid_to"),
    )

    # ---- brand-new keys + new versions of changed keys ----
    existing_ids = existing_with_scd.select(business_key).distinct()
    new_customers = new_with_scd.join(existing_ids, on=business_key, how="left_anti")
    changed_new_records = new_with_scd.join(
        changed_keys, on=business_key, how="left_semi"
    )

    final_columns = output_cols or [
        c for c in new_with_scd.columns if c in existing_updated.columns
    ]
    return (
        existing_updated.select(final_columns)
        .unionByName(new_customers.select(final_columns))
        .unionByName(changed_new_records.select(final_columns))
    )


def get_current(scd_df: DataFrame) -> DataFrame:
    """Latest version per key (scd_customer_transform.py:209-221)."""
    return scd_df.filter(F.col("is_current"))


def get_history(scd_df: DataFrame, business_key: str, key_value) -> DataFrame:
    """Full ordered history for one key (scd_customer_transform.py:224-241)."""
    return scd_df.filter(F.col(business_key) == key_value).orderBy("valid_from")


def as_of(scd_df: DataFrame, as_of_date: str) -> DataFrame:
    """Point-in-time snapshot: the version of each key that was valid
    on ``as_of_date`` — the temporal query SCD2 history exists to
    answer (the reference stores valid_from/valid_to but never reads
    them back, scd_customer_transform.py:44-63). A key with no version
    covering the date (created later / deleted before) is absent.
    Pure filter — partition-prunable if history is laid out by
    valid_from, and costs one scan at any scale."""
    d = F.lit(as_of_date).cast("date")
    return scd_df.filter(
        (F.col("valid_from") <= d)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > d))
    )


def scd1_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    delete_flag: str = "is_delete",
) -> DataFrame:
    """Type-1 merge (MERGE INTO semantics, no history): rows in
    ``changes`` overwrite matching ``base`` rows, new keys insert, and
    rows flagged ``delete_flag`` remove the key entirely. The
    complement of SCD2 (scd2.apply_scd_type2 keeps versions; this
    keeps only latest state — the reference's overwrite-mode silver
    dims are an implicit, file-level version of exactly this).

    Formulation: base LEFT ANTI touched-keys ∪ non-delete changes —
    one shuffle on the key for the anti join (the union is free).
    At scale this is what Delta/Iceberg MERGE compiles to minus the
    file-pruning layer; with the base bucketed on the key
    (io/writers.write_bucketed) the anti join is exchange-free too.
    """
    upserts = changes.filter(~F.col(delete_flag)).drop(delete_flag)
    touched = changes.select(key)
    kept = base.join(touched, key, "left_anti")
    return kept.unionByName(upserts)
