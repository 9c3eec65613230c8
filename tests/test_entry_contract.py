"""Driver-contract shape checks for __spark_entry__.py."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402


def test_registry_shape():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) >= 45
    assert set(oracles) <= set(qs), "oracle without a query"
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())
    # rows-only entries are exactly the non-SQL-expressible ones
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "cti_mentions", "cti_entities", "cti_triples", "cti_entity_pagerank",
        "word2vec_vectors", "media_features", "dnrti_eval", "malwaredb_eval",
    }


def test_one_query_runs_at_smallest_sf(spark):
    df = entry.queries()["pricing_summary"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows and set(df.columns) >= {"l_returnflag", "sum_qty", "count_order"}
