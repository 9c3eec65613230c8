"""W1 sentencization — pure relational, no Python in the hot path.

The reference assembles sentences from contiguous non-blank lines
(data_utils.py:48-82). Over a corpus of file contents the same semantics
are: split on newline → posexplode → drop blank lines → whitespace
tokenize. Catalyst keeps this entirely JVM-side (codegen'd), and the
sha256 invariant column (input_hint) is computed once at scan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_sha256(corpus: DataFrame) -> DataFrame:
    """Per-row content sha256 — the invariant carried through every stage
    (BASELINE.json input_hint; F.sha2 is a JVM built-in, SURVEY F6)."""
    return corpus.withColumn("sha256", F.sha2(F.col("content"), 256))


def sentencize(corpus: DataFrame) -> DataFrame:
    """corpus(repo,path,commit,lang,content[,sha256]) → one row per
    non-blank line with tokens array. sent_id = line ordinal."""
    df = corpus if "sha256" in corpus.columns else with_sha256(corpus)
    lines = df.select(
        "repo",
        "path",
        "commit",
        "sha256",
        F.posexplode(F.split(F.col("content"), r"\r\n|\r|\n")).alias("sent_id", "line"),
    )
    return (
        lines.withColumn("line", F.trim(F.col("line")))
        .filter(F.length("line") > 0)
        .withColumn("tokens", F.split(F.col("line"), r"\s+"))
        .filter(F.size("tokens") > 0)
        .select("repo", "path", "commit", "sha256", F.col("sent_id").cast("long"), "tokens")
    )
