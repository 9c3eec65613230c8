"""Physical-plan assertions: the plans we'd want at 100 TB, not just
plans that pass. Checks Catalyst actually gives us predicate pushdown,
column pruning, broadcast joins, and map-side partial aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_and_column_pruning(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1995-01-01").select("l_orderkey", "l_quantity")
    plan = plan_of(q)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200], plan
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema, plan


def test_enrichment_join_broadcasts_dims(spark):
    from ner4cti_spark.entry_queries import q_enrichment_join

    plan = plan_of(q_enrichment_join(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_vocab_agg_has_partial_aggregation(spark):
    from ner4cti_spark.entry_queries import q_vocab_word_freq

    plan = plan_of(q_vocab_word_freq(spark, SF))
    # partial (map-side) + final hash aggregate pair around the exchange
    assert plan.count("HashAggregate") >= 2, plan
    assert "Exchange" in plan, plan


def test_mention_alias_join_is_broadcast(spark):
    """link_mentions must broadcast the vocabulary-sized alias table —
    a sort-merge join here would shuffle the whole corpus."""
    from ner4cti_spark import graph
    from ner4cti_spark.corpus import generate_corpus
    from ner4cti_spark.pipeline import PipelineConfig, extract_mentions, link_entities

    corpus = generate_corpus(spark, n_docs=30)
    cfg = PipelineConfig(num_partitions=4)
    mentions = extract_mentions(spark, corpus, cfg)
    ents = link_entities(mentions, cfg)
    plan = plan_of(graph.link_mentions(mentions, ents))
    assert "BroadcastHashJoin" in plan, plan


def test_whole_stage_codegen_in_relational_path(spark):
    from ner4cti_spark.entry_queries import q_pricing_summary

    # AQE wraps the plan pre-execution and reports 0 codegen subtrees
    # until runtime re-planning; disable it just for this probe
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = q_pricing_summary(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "codegen"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen subtrees" in plan and "Found 0" not in plan, plan[:400]


def test_no_cartesian_product_in_pipeline(spark):
    from ner4cti_spark import graph
    from ner4cti_spark.corpus import generate_corpus
    from ner4cti_spark.pipeline import PipelineConfig, extract_mentions, link_entities

    corpus = generate_corpus(spark, n_docs=30)
    cfg = PipelineConfig(num_partitions=4)
    mentions = extract_mentions(spark, corpus, cfg)
    ents = link_entities(mentions, cfg)
    triples = graph.build_triples(graph.link_mentions(mentions, ents), ents)
    plan = plan_of(triples)
    assert "CartesianProduct" not in plan, plan


def test_pos_skipgram_pairs_has_no_join_exchange(spark):
    """r6: POS skip-gram pair generation is array-local per document —
    the plan must contain NO join (the old exploded-token self-join put
    a corpus-scale shuffle in front of the ≤324-cell aggregation) and
    exactly one Exchange: the tiny pair-count groupBy."""
    from ner4cti_spark.entry_queries import q_pos_skipgram_pairs

    plan = plan_of(q_pos_skipgram_pairs(spark, SF))
    assert "Join" not in plan, plan
    # formatted explain lists each operator twice (tree line + detail
    # header), so exactly one Exchange node == two string occurrences
    assert plan.count("Exchange") == 2, plan
    # map-side partial + final aggregate around that single exchange
    assert plan.count("HashAggregate") >= 2, plan


def test_pos_pair_counts_matches_join_form(spark):
    """The array-local pair generation must count exactly what the
    reference's window (j-i in [-w, w-1], j != i, per sentence) counts —
    checked against a brute-force python enumeration."""
    import numpy as np

    from ner4cti_spark.kernel import pos
    from ner4cti_spark.training import pos_pair_counts

    sents = spark.createDataFrame(
        [
            ("d1", 0, ["The", "attacker", "used", "Mimikatz", "to", "dump", "credentials"]),
            ("d1", 1, ["APT28", "targeted", "governments"]),
            ("d2", 0, ["one"]),
            ("d2", 1, []),
        ],
        "doc_id string, sent_id long, tokens array<string>",
    )
    w = 3
    counts = pos_pair_counts(spark, sents, window=w)
    expected = np.zeros_like(counts)
    for toks in (
        ["The", "attacker", "used", "Mimikatz", "to", "dump", "credentials"],
        ["APT28", "targeted", "governments"],
        ["one"],
        [],
    ):
        ps = [pos.upos(t) for t in toks]
        for i in range(len(ps)):
            for j in range(max(0, i - w), min(i + w, len(ps))):
                if j != i:
                    expected[pos.UPOS2ID[ps[i]], pos.UPOS2ID[ps[j]]] += 1
    assert np.array_equal(counts, expected)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located join: both sides bucketed on the join key → SortMergeJoin
    with NO shuffle Exchange on either side (the 100 TB repeated-join
    pattern; one-sided bucketing still saves that side's shuffle)."""
    from ner4cti_spark.operators.bucketing import load_table, save_bucketed

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    orders = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey", "o_totalprice")
    save_bucketed(li, "b_lineitem", "l_orderkey", 8)
    save_bucketed(orders.withColumnRenamed("o_orderkey", "l_orderkey"), "b_orders", "l_orderkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = load_table(spark, "b_lineitem").join(load_table(spark, "b_orders"), "l_orderkey")
        plan = plan_of(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and it still computes correctly
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_aqe_splits_skewed_join(spark):
    """Hot-key skew (north_rule: 'skew handled explicitly'): AQE splits
    the skewed partition at runtime — the executed plan marks the join
    skew=true instead of one straggler task dragging the stage."""
    from pyspark.sql import functions as F

    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        # key 0 holds ~90% of 300k fact rows
        fact = spark.range(300_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(2_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        j = fact.join(dim, "k")
        # execute THIS DataFrame (count() builds a different QueryExecution
        # whose finalization doesn't touch j's plan)
        assert len(j.collect()) > 0
        final_plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:1500]
        assert "AQEShuffleRead" in final_plan
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
