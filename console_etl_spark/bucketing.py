"""Bucketed tables: co-located, exchange-free joins (SURVEY.md §2.3
"100 TB design rules" — pre-partitioning for repeated big-big joins).

A shuffle on a 100 TB fact table costs more than the join itself. When
the same join key is hit repeatedly (lineitem ⋈ orders on orderkey every
night), bucketing amortizes that shuffle to WRITE time: both tables are
hash-clustered into the same number of buckets on the key, so Spark
plans a sort-merge join with NO Exchange on either side — verified in
tests by asserting the physical plan is exchange-free.

Bucketed tables require the session catalog (``saveAsTable``); the
warehouse dir is local here, object storage + a metastore in
production. Bucket counts must match across join sides (or divide
evenly); pick them so bucket_size ≈ 128-512 MB at production scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_also: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets additionally removes the per-task Sort from
    later sort-merge joins — the join becomes a pure streaming merge.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_also:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; Catalyst picks up its bucket spec from
    the catalog and plans exchange-free joins on the bucket key."""
    return spark.table(table)


def cojoin(spark: SparkSession, left: str, right: str, on: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs this plans with zero Exchange operators."""
    return read_table(spark, left).join(read_table(spark, right), on, how)
