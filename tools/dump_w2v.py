"""Dump corpus Word2Vec vectors to npz for the driver-local experiment
harness (tools/exp_quality.py neural experiments run without Spark in
the loop; the vectors come from the SAME training._word_vectors fit the
shipped artifacts use, so experiment numbers transfer).

Usage: python tools/dump_w2v.py [dnrti|malwaredb] [dim] [min_count]
Writes /tmp/ner4cti_w2v_{corpus}_{dim}_mc{min_count}.npz  (words, vecs).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dump(corpus: str, dim: int, min_count: int = 2, max_iter: int = 1,
         window: int = 5) -> str:
    from ner4cti_spark.session import get_spark
    from ner4cti_spark.training import _word_vectors

    spark = get_spark(app_name="w2v_dump", cores=8, shuffle_partitions=8)
    rows = _word_vectors(spark, corpus, dim=dim, seed=42,
                         min_count=min_count, max_iter=max_iter,
                         window=window).collect()
    words = np.array([r["word"] for r in rows], dtype=np.str_)
    vecs = np.array([list(r["vector"]) for r in rows], dtype=np.float32)
    out = f"/tmp/ner4cti_w2v_{corpus}_{dim}_mc{min_count}_it{max_iter}_w{window}.npz"
    np.savez_compressed(out, words=words, vecs=vecs)
    print(f"{out}: {len(words)} words x {dim}")
    return out


if __name__ == "__main__":
    corpus = sys.argv[1] if len(sys.argv) > 1 else "dnrti"
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    mc = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    it = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    wn = int(sys.argv[5]) if len(sys.argv) > 5 else 5
    dump(corpus, dim, mc, it, wn)
