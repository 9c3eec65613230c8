"""Multi-table sign-LSH ANN index: planted near-dups are found, recall
matches the analytic curve's operating point, planes are deterministic."""

from __future__ import annotations

import numpy as np
import pytest

from ner4cti_spark.dataprep_queries import (
    _ANN_BITS,
    _ANN_TABLES,
    _ann_planes,
)


def test_planes_deterministic_rademacher():
    R1, R2 = _ann_planes(64), _ann_planes(64)
    assert R1 is R2 or np.array_equal(R1, R2)
    assert set(np.unique(R1)) == {-1.0, 1.0}
    assert R1.shape == (_ANN_TABLES * _ANN_BITS, 64)
    # roughly balanced per plane (md5 uniformity)
    assert 0.3 < (R1 > 0).mean() < 0.7


def _bucket_ids(E: np.ndarray) -> np.ndarray:
    """(n, T) int bucket ids — same construction as _embedding_buckets."""
    S = E @ _ann_planes(E.shape[1]).T >= 0.0
    out = np.zeros((len(E), _ANN_TABLES), dtype=np.int64)
    for t in range(_ANN_TABLES):
        block = S[:, t * _ANN_BITS : (t + 1) * _ANN_BITS]
        out[:, t] = block @ (1 << np.arange(_ANN_BITS))
    return out


def test_planted_neardups_are_bucketed_together():
    """Pairs at cosine ≥ 0.99 co-bucket in ≥1 of the T tables with
    analytic prob 1-(1-(1-θ/π)^B)^T ≈ 0.93; over 60 planted pairs the
    observed hit rate must clear 0.8 (deterministic — fixed planes and
    fixed seed)."""
    rng = np.random.default_rng(11)
    n_pairs, dim = 60, 64
    base = rng.standard_normal((n_pairs, dim))
    # near-identical copy: tiny perturbation → cos ≥ ~0.995
    near = base + 0.05 * rng.standard_normal((n_pairs, dim))
    cos = (base * near).sum(1) / (
        np.linalg.norm(base, axis=1) * np.linalg.norm(near, axis=1))
    assert cos.min() > 0.99
    ba, bb = _bucket_ids(base), _bucket_ids(near)
    hit = (ba == bb).any(axis=1)
    assert hit.mean() >= 0.8, hit.mean()


def test_random_pairs_rarely_collide():
    """Unrelated vectors (cos ≈ 0) share a 16-bit bucket with prob
    ~(1/2)^16 per table — the index prunes ~everything."""
    rng = np.random.default_rng(12)
    E = rng.standard_normal((400, 64))
    b = _bucket_ids(E)
    collisions = 0
    for t in range(_ANN_TABLES):
        _, counts = np.unique(b[:, t], return_counts=True)
        collisions += int((counts * (counts - 1) // 2).sum())
    assert collisions <= 40  # out of 4 × C(400,2) ≈ 319k pair-slots (~0.01%)


@pytest.mark.usefixtures("spark")
def test_spark_buckets_match_numpy(spark):
    """The mapInPandas bucketing equals the driver-side numpy
    construction on the real test table."""
    from ner4cti_spark.dataprep_queries import _embedding_buckets, load

    sf = "/root/testdata/sf0.001"
    rows = load(spark, sf, "embeddings").select("vec_id", "embedding").collect()
    E = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    ids = _bucket_ids(E)
    want = {
        (int(r["vec_id"]), t): int(ids[i, t])
        for i, r in enumerate(rows) for t in range(_ANN_TABLES)
    }
    got_rows = _embedding_buckets(spark, sf).collect()
    assert len(got_rows) == len(want)
    for r in got_rows:
        bucket_int = int(r["bucket"][::-1], 2)  # string is b ascending left→right
        assert want[(int(r["vec_id"]), int(r["tbl"]))] == bucket_int
