"""M13 (POS skip-gram embedding training) + the generated UPOS SQL.

Covers: upos_case_sql three-way parity (Python upos() / Spark SQL /
DuckDB) on an all-branch token battery, reference-window pair counting
(POS_Embedding.py:60-68 asymmetric bound), the deterministic full-batch
skip-gram fit, and substitution of the trained table into the tagger
kernel's M2 fusion.
"""

from __future__ import annotations

import numpy as np
import pytest

from ner4cti_spark.kernel import pos
from ner4cti_spark.training import (
    corpus_available,
    fit_pos_skipgram,
    pos_pair_counts,
    train_pos_embeddings,
)

# one token per upos() branch, plus precedence traps ("that" is in both
# _DET and _SCONJ — DET must win; "no" is DET before INTJ; "2017" NUM;
# mixed identifiers X; capitalized PROPN before suffix rules)
BATTERY = [
    "...", "$$", "%", "!!", "2017", "12a34", "the", "that", "no", "of",
    "they", "and", "because", "is", "quickly", "not", "'s", "oh",
    "CVE-2017-0144", "abc123", "C:\\Windows", "Mandiant", "APT28",
    "running", "infected", "normalize", "clarify", "dangerous",
    "responsive", "infection", "ransomware", "cat", "dog", "x",
    "ly", "ed", "ing", "a1b2c3d4", "to", "it",
]


def test_upos_sql_three_way_parity(spark):
    expected = [pos.upos(t) for t in BATTERY]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(t,) for t in BATTERY], "tok string")
    got_spark = [
        r["p"]
        for r in df.select(F.expr(pos.upos_case_sql("tok")).alias("p"))
        .collect()
    ]
    assert got_spark == expected

    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (tok VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in BATTERY])
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {pos.upos_case_sql('tok')} FROM t"
        ).fetchall()
    ]
    assert got_duck == expected


def test_pos_pair_counts_reference_window(spark):
    # reference semantics transcribed from POS_Embedding.py:60-68:
    # context j in range(max(0, i-w), min(i+w, n)), j != i — note the
    # asymmetric bound (reaches i-w on the left, i+w-1 on the right)
    sents = [
        ["The", "attacker", "used", "Mimikatz", "."],
        ["APT28", "dropped", "2017", "malware"],
    ]
    w = 3
    expected = np.zeros((pos.N_UPOS, pos.N_UPOS))
    for toks in sents:
        ids = [pos.upos_id(t) for t in toks]
        for i, c in enumerate(ids):
            for j in range(max(0, i - w), min(i + w, len(ids))):
                if j != i:
                    expected[c, ids[j]] += 1

    df = spark.createDataFrame(
        [(0, k, toks) for k, toks in enumerate(sents)],
        "doc_id int, sent_id int, tokens array<string>",
    )
    got = pos_pair_counts(spark, df, window=w)
    assert np.array_equal(got, expected)
    # the asymmetry is real: the matrix must NOT be symmetric here
    assert not np.array_equal(got, got.T)


def test_fit_pos_skipgram_deterministic_and_converges():
    rng = np.random.default_rng(0)
    counts = np.zeros((pos.N_UPOS, pos.N_UPOS))
    counts[:4, :6] = rng.integers(0, 50, size=(4, 6))
    counts[1] = counts[0]          # tags 0 and 1: identical contexts
    counts[2, :6] = [100, 0, 0, 0, 0, 90]  # tag 2: disjoint profile
    counts[0, 5] = counts[1, 5] = 0
    emb_a, losses = fit_pos_skipgram(counts, steps=1500, seed=7)
    emb_b, _ = fit_pos_skipgram(counts, steps=1500, seed=7)
    assert emb_a.shape == (pos.N_UPOS, 10) and emb_a.dtype == np.float32
    assert np.array_equal(emb_a, emb_b)
    assert losses[-1] < losses[0] * 0.9

    def cos(x, y):
        return float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))

    # identical context distributions → embeddings converge together;
    # a disjoint profile stays apart
    assert cos(emb_a[0], emb_a[1]) > cos(emb_a[0], emb_a[2])

    # degenerate input: no pairs at all → still returns a valid table
    emb_z, _ = fit_pos_skipgram(np.zeros((pos.N_UPOS, pos.N_UPOS)), steps=5)
    assert emb_z.shape == (pos.N_UPOS, 10)


@pytest.mark.skipif(not corpus_available("dnrti"), reason="corpus absent")
def test_trained_pos_emb_substitutes_into_kernel(spark):
    from ner4cti_spark.kernel.tagger import TaggerKernel
    from ner4cti_spark.kernel.weights import build_weights

    emb = train_pos_embeddings(spark, "dnrti", steps=60)
    w = build_weights()
    assert emb.shape == w["pos_emb"].shape and emb.dtype == np.float32
    w["pos_emb"] = emb
    tags, _scores = TaggerKernel(w).tag(
        [["APT28", "used", "Mimikatz", "against", "NATO"]]
    )
    assert len(tags) == 1 and len(tags[0]) == 5
