"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB, repeatedly joining corpus-scale tables on the same key
(repo, entity_id, …) should not re-shuffle every query. Writing both
sides `bucketBy(N, key)` pre-partitions them on disk; Catalyst then
plans a SortMergeJoin with NO Exchange on either side. This module
wraps the save/load ceremony (bucketing requires saveAsTable — a
metastore entry — not a bare parquet path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 16,
                  sort: bool = True) -> None:
    """Persist as a bucketed (and optionally sorted) managed table —
    the parquet analog of an Iceberg bucket-partitioned table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def load_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
