"""MinHash-LSH candidate blocking for entity linking (J6 analog).

The reference's similar-word top-k join (security_augmentation.py:25-56)
becomes, at KG scale, candidate-pair generation over mention surfaces:
distinct normalized surfaces → character n-gram shingles → MinHash
signatures → band-bucket join. Only candidates sharing a band bucket are
scored — the O(n²) pair space never materializes.

Two implementations:
- `candidate_pairs_ml`: pyspark.ml MinHashLSH.approxSimilarityJoin
  (JVM-side, exact Jaccard on candidates).
- `candidate_pairs_sql`: pure DataFrame minhash banding (md5-based,
  engine-portable — the same algorithm the DuckDB oracle can run).
Both restrict pairs to equal etype and return exact Jaccard similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 12
BAND_SIZE = 2  # 6 bands × 2 rows

# Fuzzy similarity linking applies to named entities only. Indicators and
# CVE ids are identities — 'CVE-2014-1111' and 'CVE-2014-1112' are
# different vulnerabilities however similar their strings — so they link
# strictly by exact normalized equality.
FUZZY_ETYPES = ("threat-actor", "malware", "tool", "attack-pattern")


def normalize_surface(col):
    """lowercase, strip separators — 'APT 28'/'APT-28'/'apt28' all meet."""
    return F.regexp_replace(F.lower(col), r"[\s\-_\.]+", "")


def exact_pairs(surfaces: DataFrame) -> DataFrame:
    """Edges between surfaces equal after normalization — the guaranteed
    high-precision linker for every etype. One groupBy on (etype, norm);
    pairs materialize per-group (groups are tiny alias sets)."""
    base = (
        surfaces.select("etype", "surface").distinct()
        .withColumn("norm", normalize_surface(F.col("surface")))
    )
    grouped = (
        base.groupBy("etype", "norm")
        .agg(F.sort_array(F.collect_set("surface")).alias("ss"))
        .filter(F.size("ss") >= 2)
    )
    return grouped.select(
        "etype",
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ss"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ss"), i + F.lit(2), F.size("ss")),
                        lambda y: F.struct(x.alias("surface_a"), y.alias("surface_b")),
                    ),
                )
            )
        ).alias("p"),
    ).select(
        "etype", F.col("p.surface_a").alias("surface_a"),
        F.col("p.surface_b").alias("surface_b"), F.lit(1.0).alias("jaccard"),
    )


def surface_shingles(df: DataFrame, text_col: str = "norm", n: int = 3) -> DataFrame:
    """Distinct char n-grams per surface, over '^text$' padding."""
    padded = F.concat(F.lit("^"), F.col(text_col), F.lit("$"))
    idx = F.sequence(F.lit(0), F.greatest(F.length(padded) - n, F.lit(0)))
    return df.withColumn(
        "shingles",
        F.array_distinct(F.transform(idx, lambda i: padded.substr(i + F.lit(1), F.lit(n)))),
    )


def candidate_pairs_sql(
    surfaces: DataFrame,
    sim_threshold: float = 0.5,
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """surfaces(etype, surface) → pairs (etype, surface_a, surface_b, jaccard).

    Plan shape at scale — exactly THREE shuffles: the minhash groupBy,
    the band-bucket self-join (short md5-derived keys → high bucket
    cardinality, low skew), and the final pair dedup. The shingle SET is
    carried through the minhash aggregation (collect_set alongside the
    12 mins), so the exact-Jaccard re-score reads arrays both join sides
    already carry — no re-join against the shingle table, and no
    defensive distinct()s: exact-duplicate input surfaces collapse at
    the groupBy, and pairs meeting in several buckets collapse at the
    final dedup (their per-row jaccard is identical by construction).

    Row-width tradeoff of the carried shingle sets: the band explode
    replicates each surface's full shingle array 6× into the self-join
    shuffle on both sides. For the short normalized surfaces this
    engine links (entity names, tens of chars → tens of 3-gram
    shingles) that is a few hundred bytes per row and strictly cheaper
    than the re-join it replaced; if the input ever carries long
    surfaces (sentence-scale strings), cap or size-check the arrays
    before re-enabling the carry.

    Minhash = min over md5(seed‖shingle) hex strings — a portable family
    (expressible in ANSI SQL for the oracle). Computed via explode +
    groupBy-min with REGULAR expressions: the tempting one-liner
    `array_min(transform(shingles, s -> md5(...)))` miscompiles under
    Spark 4.1 whole-stage codegen when several such lambdas share a
    select (lambda-variable binding is plan-dependent — observed
    returning different minhashes for identical input across
    otherwise-identical runs).
    """
    base = (
        surfaces.select("etype", "surface")
        .filter(F.col("etype").isin(*FUZZY_ETYPES))
        .withColumn("norm", normalize_surface(F.col("surface")))
    )
    sh = surface_shingles(base).select("etype", "surface", "shingles")
    exploded = sh.select("etype", "surface", F.explode("shingles").alias("s"))
    mh = exploded.groupBy("etype", "surface").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"h{i}:"), F.col("s")))).alias(f"mh{i}")
            for i in range(n_hashes)
        ],
        F.collect_set("s").alias("shingles"),
    )
    n_bands = n_hashes // band_size
    bands = F.array(
        *[
            F.md5(F.concat_ws("|", F.lit(f"band{b}"),
                              *[F.col(f"mh{b * band_size + r}") for r in range(band_size)]))
            for b in range(n_bands)
        ]
    )
    bucketed = mh.select("etype", "surface", "shingles", F.explode(bands).alias("bucket"))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.etype") == F.col("b.etype"))
            & (F.col("a.surface") < F.col("b.surface")),
        )
        .select(
            F.col("a.etype").alias("etype"),
            F.col("a.surface").alias("surface_a"),
            F.col("b.surface").alias("surface_b"),
            (
                F.size(F.array_intersect("a.shingles", "b.shingles"))
                / F.size(F.array_union("a.shingles", "b.shingles"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= sim_threshold)
        .dropDuplicates(["etype", "surface_a", "surface_b"])
        .select("etype", "surface_a", "surface_b", F.round("jaccard", 6).alias("jaccard"))
    )


def candidate_pairs_ml(surfaces: DataFrame, sim_threshold: float = 0.5) -> DataFrame:
    """pyspark.ml variant: HashingTF(binary) over shingles → MinHashLSH
    approxSimilarityJoin. Used when ml jars are available; same output
    contract as candidate_pairs_sql."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    base = (
        surfaces.select("etype", "surface")
        .filter(F.col("etype").isin(*FUZZY_ETYPES))
        .distinct()
        .withColumn("norm", normalize_surface(F.col("surface")))
    )
    sh = surface_shingles(base).filter(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", binary=True, numFeatures=1 << 18)
    feats = tf.transform(sh)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=6, seed=42)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, 1.0 - sim_threshold, distCol="dist")
    return (
        joined.filter(
            (F.col("datasetA.etype") == F.col("datasetB.etype"))
            & (F.col("datasetA.surface") < F.col("datasetB.surface"))
        )
        .select(
            F.col("datasetA.etype").alias("etype"),
            F.col("datasetA.surface").alias("surface_a"),
            F.col("datasetB.surface").alias("surface_b"),
            F.round(1.0 - F.col("dist"), 6).alias("jaccard"),
        )
        .distinct()
    )
