"""Example: the reference's train→evaluate workflow on CoNLL data.

    python examples/evaluate_conll.py --data-dir /root/reference/DNRTI_Dataset --dnrti
    python examples/evaluate_conll.py --data-dir /root/reference/MalwareDB/MalwareDB \\
        --etypes Action Entity Modifier

Reads {train,test}.txt (one `token TAG` per line, blank-line sentence
separator — the reference's format), induces a lexicon from the train
split, tags the test split distributed, and prints the reference's
evaluation metrics (token accuracy, weighted F1) plus span P/R/F1.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from ner4cti_spark.kernel.labels import LabelSpace        # noqa: E402
from ner4cti_spark.kernel.weights import build_weights    # noqa: E402
from ner4cti_spark.operators import conll                 # noqa: E402
from ner4cti_spark.session import get_spark               # noqa: E402
from ner4cti_spark.tagging import tag_token_frames        # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--dnrti", action="store_true",
                    help="map DNRTI tags onto the engine's CTI classes")
    ap.add_argument("--etypes", nargs="*", default=None,
                    help="custom tagset (e.g. Action Entity Modifier)")
    args = ap.parse_args()

    spark = get_spark("evaluate_conll")
    train = conll.read_conll(spark, f"{args.data_dir}/train.txt")
    test = conll.read_conll(spark, f"{args.data_dir}/test.txt").cache()
    if args.dnrti:
        train, test = conll.map_dnrti_tags(train), conll.map_dnrti_tags(test)
        ls, patterns = None, True
    else:
        ls = LabelSpace(sorted(args.etypes)) if args.etypes else None
        patterns = ls is None

    lex = conll.induce_lexicon(train)
    print(f"induced lexicon: {len(lex)} phrases")
    sc = spark.sparkContext
    weights = build_weights(label_space=ls) if ls else build_weights()
    pred = tag_token_frames(
        test.select("doc_id", "sent_id", "tokens"),
        sc.broadcast(weights), sc.broadcast(lex),
        use_patterns=patterns, label_space=ls,
    ).cache()
    conll.evaluate_tags(pred, test).show()
    conll.span_prf(
        conll.extract_span_rows(pred), conll.extract_span_rows(test)
    ).show()


if __name__ == "__main__":
    main()
