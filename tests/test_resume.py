"""Lineage + idempotent resume (north_rule; FIXTURES.md §7)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from ner4cti_spark.corpus import generate_corpus
from ner4cti_spark.pipeline import PipelineConfig, run_pipeline


def _triple_hash(spark, out_dir):
    df = spark.read.parquet(f"{out_dir}/triples")
    return (
        df.select(F.sha2(F.concat_ws("|", "subj", "pred", "obj"), 256).alias("h"))
        .agg(F.expr("bit_xor(cast(conv(substring(h,1,15),16,10) as bigint))").alias("x"))
        .collect()[0]["x"],
        df.select("subj", "pred", "obj").distinct().count(),
    )


def test_resume_is_idempotent(spark, tmp_path):
    out_dir = str(tmp_path / "kg")
    corpus = generate_corpus(spark, n_docs=60).cache()
    cfg = PipelineConfig()

    run_pipeline(spark, corpus, cfg, out_dir=out_dir)
    h1, n1 = _triple_hash(spark, out_dir)
    lin1 = spark.read.parquet(f"{out_dir}/_lineage")
    assert lin1.count() > 0
    assert set(lin1.columns) >= {
        "stage", "partition_key", "repo_min", "repo_max",
        "row_count", "content_sha256_xor", "completed_at",
    }

    # rerun on completed output → everything skipped, nothing duplicated
    run_pipeline(spark, corpus, cfg, out_dir=out_dir)
    h2, n2 = _triple_hash(spark, out_dir)
    assert (h1, n1) == (h2, n2)

    # destroy part of the TAG checkpoint + its lineage rows → rerun must
    # reprocess exactly those buckets and reproduce identical triples
    lin = spark.read.parquet(f"{out_dir}/_lineage")
    victims = [
        r["partition_key"]
        for r in lin.filter("stage = 'tag'").select("partition_key").distinct().limit(8).collect()
    ]
    keep = lin.filter(
        ~((F.col("stage") == "tag") & F.col("partition_key").isin(victims))
    ).localCheckpoint(eager=True)
    for pk in victims:
        shutil.rmtree(f"{out_dir}/mentions/bucket={pk}", ignore_errors=True)
    shutil.rmtree(f"{out_dir}/_lineage")
    keep.write.mode("overwrite").parquet(f"{out_dir}/_lineage")

    run_pipeline(spark, corpus, cfg, out_dir=out_dir)
    h3, n3 = _triple_hash(spark, out_dir)
    assert (h1, n1) == (h3, n3), "resume did not reproduce identical triples"
    # and the rebuilt lineage again covers the victim buckets
    lin3 = spark.read.parquet(f"{out_dir}/_lineage").filter("stage='tag'")
    have = {r["partition_key"] for r in lin3.select("partition_key").collect()}
    assert set(victims) <= have


def test_lineage_digest_matches_python_recomputation(spark, tmp_path):
    """content_sha256_xor = xor of DISTINCT leading-60-bit sha256 values
    per bucket — verified against a driver-side recomputation."""
    from pyspark.sql import functions as F

    from ner4cti_spark.corpus import generate_corpus
    from ner4cti_spark.lineage import lineage_rows, with_bucket
    from ner4cti_spark.operators.sentencize import sentencize, with_sha256

    sents = with_bucket(sentencize(with_sha256(generate_corpus(spark, n_docs=30))))
    lin = {r["partition_key"]: r for r in lineage_rows(sents, "tag").collect()}
    rows = sents.select("bucket", "sha256").collect()
    by_bucket: dict[int, set] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], set()).add(r["sha256"])
    for b, hashes in by_bucket.items():
        x = 0
        for h in hashes:
            x ^= int(h[:15], 16)
        assert lin[str(b)]["content_sha256_xor"] == f"{x:015x}", b
        assert lin[str(b)]["row_count"] == sum(1 for r in rows if r["bucket"] == b)
