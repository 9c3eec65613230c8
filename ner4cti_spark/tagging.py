"""Distributed tagging: sentences → mentions via mapInPandas.

The engine's hot path (SURVEY §3.3 rebuild): broadcast weights once,
lazy-init the kernel per executor process, tag whole Arrow batches,
emit exploded mention rows (a UDTF-shaped mapInPandas). No per-row
Python — each batch is one vectorized forward + one batched Viterbi.

Skew: giant repos are spread by salted repartition on
(repo, pmod(hash(path), S)) before tagging, per SURVEY §4.2.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kernel.tagger import TaggerKernel, extract_spans, lookup_canonical

_KERNEL_CACHE: dict[int, TaggerKernel] = {}

MENTION_SCHEMA = (
    "repo string, path string, commit string, sha256 string, sent_id long, "
    "begin int, end int, surface string, etype string, score float, "
    "canonical_hint string"
)

TAGGED_SCHEMA = (
    "repo string, path string, commit string, sha256 string, sent_id long, "
    "tokens array<string>, tags array<string>, score float"
)


def _get_kernel(weights_bc, neural_scale: float, decode: str,
                phrases_bc=None, use_patterns: bool = True,
                label_space=None, sent_cache: bool = True) -> TaggerKernel:
    # keyed by the broadcast's dump-file path (stable, unique per
    # broadcast, present on both driver and workers) — NOT id(): a GC'd
    # broadcast's address can be reused, which would silently serve a
    # kernel built from a different weights/lexicon broadcast
    def _bkey(bc) -> str:
        return getattr(bc, "_path", None) or f"id:{id(bc)}"

    from .kernel.labels import CTI

    ls = label_space or CTI
    key = (_bkey(weights_bc), _bkey(phrases_bc) if phrases_bc is not None else "-",
           neural_scale, decode, use_patterns, tuple(ls.etypes), sent_cache)
    k = _KERNEL_CACHE.get(key)
    if k is None:
        # bounded LRU: long-lived executors serve MANY jobs, each with its
        # own weights broadcast → its own kernel whose token/sentence
        # caches grow to ~100 MB at corpus scale. Unbounded, a reused
        # Python worker accumulates one such kernel per job and its RSS
        # climbs until the box pages (measured: tag stage 21.6s cold →
        # 32.4s after three prior jobs at local[32]). Keep the most
        # recent few; stale broadcasts never come back.
        while len(_KERNEL_CACHE) >= 4:
            _KERNEL_CACHE.pop(next(iter(_KERNEL_CACHE)))
        k = TaggerKernel(
            weights_bc.value, neural_scale=neural_scale, decode=decode,
            phrases=phrases_bc.value if phrases_bc is not None else None,
            use_patterns=use_patterns, label_space=ls, sent_cache=sent_cache,
        )
        _KERNEL_CACHE[key] = k
    else:
        _KERNEL_CACHE[key] = _KERNEL_CACHE.pop(key)  # refresh LRU position
    return k


def tag_token_frames(df: DataFrame, weights_bc, phrases_bc=None,
                     use_patterns: bool = True, neural_scale: float = 0.1,
                     decode: str = "viterbi", label_space=None) -> DataFrame:
    """Generic tagging over (doc_id, sent_id, tokens) frames (e.g. CoNLL
    splits) with an optional corpus-induced lexicon broadcast."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kernel = _get_kernel(weights_bc, neural_scale, decode, phrases_bc,
                             use_patterns, label_space)
        for pdf in batches:
            if pdf.empty:
                continue
            tags, _scores = kernel.tag([list(t) for t in pdf["tokens"]])
            out = pdf[["doc_id", "sent_id", "tokens"]].copy()
            out["tags"] = tags
            yield out

    return df.mapInPandas(
        run, schema="doc_id string, sent_id long, tokens array<string>, tags array<string>"
    )


def salted_repartition(sentences: DataFrame, num_partitions: int, salt_buckets: int = 64
                       ) -> DataFrame:
    """Spread hot repos across partitions: partition by (repo, salt) where
    salt = pmod(hash(path, sent_id), S). At cluster scale this prevents a
    single giant repo from pinning one executor."""
    return sentences.repartition(
        num_partitions,
        F.col("repo"),
        F.pmod(F.hash(F.col("path"), F.col("sent_id")), F.lit(salt_buckets)),
    )


def tag_sentences(sentences: DataFrame, weights_bc, neural_scale: float = 0.1,
                  decode: str = "viterbi", sent_cache: bool = True) -> DataFrame:
    """sentences → tagged rows (tokens + aligned BIO tags + score)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kernel = _get_kernel(weights_bc, neural_scale, decode, sent_cache=sent_cache)
        for pdf in batches:
            if pdf.empty:
                continue
            sents = [list(t) for t in pdf["tokens"]]
            tags, scores = kernel.tag(sents)
            out = pdf[["repo", "path", "commit", "sha256", "sent_id", "tokens"]].copy()
            out["tags"] = tags
            out["score"] = scores.astype(np.float32)
            yield out

    return sentences.mapInPandas(run, schema=TAGGED_SCHEMA)


def tag_mentions(sentences: DataFrame, weights_bc, neural_scale: float = 0.1,
                 decode: str = "viterbi", sent_cache: bool = True) -> DataFrame:
    """sentences → exploded mention rows (the UDTF shape, SURVEY §2.9)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kernel = _get_kernel(weights_bc, neural_scale, decode, sent_cache=sent_cache)
        for pdf in batches:
            if pdf.empty:
                continue
            sents = [list(t) for t in pdf["tokens"]]
            tags, scores = kernel.tag(sents)
            rows: dict[str, list] = {c: [] for c in (
                "repo", "path", "commit", "sha256", "sent_id",
                "begin", "end", "surface", "etype", "score", "canonical_hint")}
            for i, (toks, tg) in enumerate(zip(sents, tags)):
                spans = extract_spans(toks, tg)
                if not spans:
                    continue
                for b, e, surface, etype in spans:
                    rows["canonical_hint"].append(
                        lookup_canonical(kernel.phrases, toks[b:e], etype)
                    )
                    rows["repo"].append(pdf["repo"].iat[i])
                    rows["path"].append(pdf["path"].iat[i])
                    rows["commit"].append(pdf["commit"].iat[i])
                    rows["sha256"].append(pdf["sha256"].iat[i])
                    rows["sent_id"].append(int(pdf["sent_id"].iat[i]))
                    rows["begin"].append(b)
                    rows["end"].append(e)
                    rows["surface"].append(surface)
                    rows["etype"].append(etype)
                    rows["score"].append(float(scores[i]))
            yield pd.DataFrame(rows)

    return sentences.mapInPandas(run, schema=MENTION_SCHEMA)
