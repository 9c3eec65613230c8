"""CoNLL reader + reference-corpus evaluation (SURVEY S2, §5.2)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ner4cti_spark.operators import conll

DNRTI = "/root/reference/DNRTI_Dataset"
needs_dnrti = pytest.mark.skipif(
    not os.path.exists(f"{DNRTI}/test.txt"), reason="reference corpus not present"
)


def test_read_conll_tiny(spark, tmp_path):
    p = tmp_path / "tiny.txt"
    p.write_text(
        "The O\nAPT28 B-HackOrg\ngroup O\n\nmalformed line here\nUses O\nMimikatz B-Tool\n\n"
    )
    df = conll.read_conll(spark, str(p))
    rows = {r["sent_id"]: r for r in df.collect()}
    assert len(rows) == 2
    s0 = min(rows)
    assert rows[s0]["tokens"] == ["The", "APT28", "group"]
    assert rows[s0]["tags"] == ["O", "B-HackOrg", "O"]
    # malformed 3-field line dropped (P2, data_utils.py:75-77)
    s1 = max(rows)
    assert rows[s1]["tokens"] == ["Uses", "Mimikatz"]


def test_extract_span_rows_and_lexicon(spark):
    df = spark.createDataFrame(
        [
            ("d", 0, ["Poison", "Ivy", "is", "bad"], ["B-tool", "I-tool", "O", "O"]),
            ("d", 1, ["Poison", "Ivy", "again"], ["B-tool", "I-tool", "O"]),
            ("d", 2, ["Ivy", "alone"], ["I-tool", "O"]),  # orphan I- → its own span
        ],
        "doc_id string, sent_id long, tokens array<string>, tags array<string>",
    )
    spans = conll.extract_span_rows(df)
    got = {(r["sent_id"], r["surface"], r["etype"], r["begin"], r["end"])
           for r in spans.collect()}
    assert (0, "Poison Ivy", "tool", 0, 2) in got
    assert (2, "Ivy", "tool", 0, 1) in got
    lex = conll.induce_lexicon(df)
    assert lex[("poison", "ivy")] == ("tool", "Poison Ivy")


def test_evaluate_tags_perfect_and_degraded(spark):
    gold = spark.createDataFrame(
        [("d", 0, ["a", "b"], ["O", "B-tool"]), ("d", 1, ["c"], ["O"])],
        "doc_id string, sent_id long, tokens array<string>, tags array<string>",
    )
    m = conll.evaluate_tags(gold, gold).collect()[0]
    assert m["accuracy"] == 1.0 and m["weighted_f1"] == 1.0 and m["n_tokens"] == 3
    pred = spark.createDataFrame(
        [("d", 0, ["a", "b"], ["O", "O"]), ("d", 1, ["c"], ["O"])],
        "doc_id string, sent_id long, tokens array<string>, tags array<string>",
    )
    m2 = conll.evaluate_tags(pred, gold).collect()[0]
    assert abs(m2["accuracy"] - 2 / 3) < 1e-6


@needs_dnrti
def test_dnrti_counts(spark):
    """Split sizes match BASELINE.md (5,251 / 662 / 664 sentences)."""
    counts = {
        split: conll.read_conll(spark, f"{DNRTI}/{split}.txt").count()
        for split in ("train", "valid", "test")
    }
    assert counts["train"] == 5251
    assert counts["valid"] == 662
    assert counts["test"] == 664


@needs_dnrti
@pytest.mark.slow
def test_dnrti_lexicon_eval_end_to_end(spark):
    """Induce a lexicon from the DNRTI train split, tag the test split
    distributed, evaluate vs gold with reference eval semantics, and
    require distributed ≡ driver tagging (the engine's real parity
    invariant — SURVEY §5.2.2)."""
    from ner4cti_spark.kernel.tagger import TaggerKernel, extract_spans
    from ner4cti_spark.kernel.weights import build_weights
    from ner4cti_spark.tagging import tag_token_frames

    train = conll.map_dnrti_tags(conll.read_conll(spark, f"{DNRTI}/train.txt"))
    test = conll.map_dnrti_tags(conll.read_conll(spark, f"{DNRTI}/test.txt")).cache()
    lex = conll.induce_lexicon(train)
    assert len(lex) > 500

    sc = spark.sparkContext
    weights_bc = sc.broadcast(build_weights())
    phrases_bc = sc.broadcast(lex)
    pred = tag_token_frames(
        test.select("doc_id", "sent_id", "tokens"), weights_bc, phrases_bc,
        use_patterns=True,
    ).cache()

    # distributed ≡ driver on identical weights+lexicon (exact match)
    kernel = TaggerKernel(build_weights(), phrases=lex, use_patterns=True)
    sample = test.orderBy("doc_id", "sent_id").limit(60).collect()
    driver_tags, _ = kernel.tag([list(r["tokens"]) for r in sample])
    dist = {
        (r["doc_id"], r["sent_id"]): r["tags"]
        for r in pred.join(
            spark.createDataFrame(
                [(r["doc_id"], r["sent_id"]) for r in sample], "doc_id string, sent_id long"
            ),
            ["doc_id", "sent_id"],
        ).collect()
    }
    for r, dtags in zip(sample, driver_tags):
        assert dist[(r["doc_id"], r["sent_id"])] == dtags

    # quality vs gold: lexicon baseline — sanity floor, not the 0.95 gate
    metrics = conll.evaluate_tags(pred, test).collect()[0]
    assert metrics["accuracy"] > 0.80
    prf = conll.span_prf(
        conll.extract_span_rows(pred), conll.extract_span_rows(test)
    ).collect()[0]
    assert prf["recall"] > 0.5
    print(f"DNRTI lexicon baseline: acc={metrics['accuracy']} wF1={metrics['weighted_f1']} "
          f"span P={prf['precision']} R={prf['recall']} F1={prf['f1']}")


MALWAREDB = "/root/reference/MalwareDB/MalwareDB"
needs_mdb = pytest.mark.skipif(
    not os.path.exists(f"{MALWAREDB}/test.txt"), reason="reference corpus not present"
)


@needs_mdb
def test_malwaredb_counts(spark):
    """Split sizes match the actual split files (5,560/700/695 — the
    reference's statistics.txt:4-5 swaps the valid/test numbers relative
    to the shipped valid.txt/test.txt; a raw line-parse of the files
    agrees with our reader)."""
    counts = {
        split: conll.read_conll(spark, f"{MALWAREDB}/{split}.txt").count()
        for split in ("train", "valid", "test")
    }
    assert counts == {"train": 5560, "valid": 700, "test": 695}


@needs_mdb
def test_malwaredb_lexicon_eval_end_to_end(spark):
    """The reference's ACTIVE corpus (arguments.py:39): dynamic label
    space (Entity/Action/Modifier), train-split lexicon, distributed
    tagging, reference eval semantics."""
    from ner4cti_spark.kernel.labels import LabelSpace
    from ner4cti_spark.kernel.weights import build_weights
    from ner4cti_spark.tagging import tag_token_frames

    ls = LabelSpace(["Action", "Entity", "Modifier"])
    train = conll.read_conll(spark, f"{MALWAREDB}/train.txt")
    test = conll.read_conll(spark, f"{MALWAREDB}/test.txt").cache()
    lex = conll.induce_lexicon(train)
    assert len(lex) > 300
    sc = spark.sparkContext
    pred = tag_token_frames(
        test.select("doc_id", "sent_id", "tokens"),
        sc.broadcast(build_weights(label_space=ls)),
        sc.broadcast(lex),
        use_patterns=False,  # no cve/indicator classes in this tagset
        label_space=ls,
    ).cache()
    m = conll.evaluate_tags(pred, test).collect()[0]
    prf = conll.span_prf(
        conll.extract_span_rows(pred), conll.extract_span_rows(test)
    ).collect()[0]
    print(f"MalwareDB lexicon baseline: acc={m['accuracy']} wF1={m['weighted_f1']} "
          f"span P={prf['precision']} R={prf['recall']} F1={prf['f1']}")
    # MalwareDB "entities" are open-vocabulary verb/noun phrases
    # ("loading and executing", "Stage 4") — a train-lexicon baseline
    # generalizes far less than on DNRTI's named entities; floors are
    # sanity checks, the engine's parity gate is distributed ≡ driver
    assert m["accuracy"] > 0.6
    assert prf["recall"] > 0.2
