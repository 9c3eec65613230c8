"""ner4cti_spark — PySpark-native CTI knowledge-graph construction engine.

A from-scratch, Spark-first rebuild of the capabilities of
LiuPeiP-CS/NER4CTI (arXiv:2207.00232): scan a corpus table
(repo, path, commit, lang, content) → sentencize → NER-tag inside batched
pandas/Arrow UDFs with broadcast weights → MinHash-LSH entity linking →
connected-component canonicalization → (subj, pred, obj) triples in
partitioned tables with per-partition lineage for idempotent resume.

Not a port: the reference is a single-process PyTorch research pipeline;
this package expresses every stage as DataFrame operations planned by
Catalyst, dropping to vectorized pandas UDFs only for the model kernel.
"""

__version__ = "0.1.0"
