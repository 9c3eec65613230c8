"""Example: build a CTI knowledge graph from your own corpus.

    python examples/tag_corpus.py --input /path/corpus.parquet --output /tmp/kg
    python examples/tag_corpus.py --synthetic 500 --output /tmp/kg   # demo

Input schema: (repo string, path string, commit string, lang string,
content string) — the BASELINE input_hint table. Equivalent reference
workflow: data_processing.py + main.py test path, but distributed and
resumable.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from ner4cti_spark.corpus import generate_corpus          # noqa: E402
from ner4cti_spark.pipeline import PipelineConfig, run_pipeline  # noqa: E402
from ner4cti_spark.session import get_spark               # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    spark = get_spark("tag_corpus")
    corpus = (
        generate_corpus(spark, n_docs=args.synthetic)
        if args.synthetic
        else spark.read.parquet(args.input)
    )
    out = run_pipeline(spark, corpus, PipelineConfig(), out_dir=args.output)
    print(f"triples: {out['triples'].count()}")
    out["triples"].groupBy("pred").count().show()
    out["entities"].filter("alias != canonical").show(10, truncate=False)


if __name__ == "__main__":
    main()
