"""Model kernel: the compute that lives inside vectorized pandas UDFs.

Pure numpy (torch is not available in this environment); eval-mode only.
Weights are a pinned, seeded bundle broadcast once per job — the
reference's checkpoints were stripped from the repo
(/root/reference/.MISSING_LARGE_BLOBS), so parity is
distributed-vs-single-process on identical weights (SURVEY.md §5.2).
"""
