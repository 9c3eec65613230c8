"""Scalable global ranker: both physical paths produce identical ids."""

from __future__ import annotations

from pyspark.sql import functions as F

from ner4cti_spark.operators.rank import global_row_number


def test_two_phase_rank_matches_window(spark):
    df = spark.range(5000).select(
        (F.col("id") % 97).alias("freq"),
        F.concat(F.lit("w"), F.col("id")).alias("word"),
    )
    order = [F.desc("freq"), F.asc("word")]
    small = global_row_number(df, order, out_col="rn")              # window path
    big = global_row_number(df, order, out_col="rn", small_threshold=0,
                            num_partitions=7)                       # two-phase path
    assert small.exceptAll(big).count() == 0
    assert big.exceptAll(small).count() == 0
    # ids are a permutation-free 1..N sequence
    n = df.count()
    got = big.agg(F.min("rn"), F.max("rn"), F.count_distinct("rn")).collect()[0]
    assert tuple(got) == (1, n, n)
