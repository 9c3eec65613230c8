"""Training-data-pipeline operations over the documents/embeddings
tables: deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard),
similarity search (brute-force cosine top-k, LSH buckets), and text
analysis (language-ID heuristic, quality scoring, token stats, document
fingerprinting). Each Spark implementation is paired with DuckDB oracle
SQL using the same (engine-portable, md5-based) hash constructions.

At 100 TB these are the scale-path designs: shingle→minhash→band→
bucket-join never materializes the O(n²) pair space; the inverted-index
Jaccard join uses word-level shingles so bucket cardinalities stay high.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .entry_queries import load

# ---------------------------------------------------------------- shingles

_WORD_SHINGLES_SQL = """
    SELECT doc_id, DISTINCT_SH.sh FROM (
      SELECT doc_id, ws FROM (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        FROM documents
      )
    ), LATERAL (
      SELECT DISTINCT array_to_string(ws[i:i+4], ' ') AS sh
      FROM UNNEST(generate_series(1, greatest(len(ws) - 4, 1))) AS t(i)
    ) DISTINCT_SH
"""


def _word_shingles(spark: SparkSession, sf_dir: str, n: int = 5) -> DataFrame:
    """(doc_id, sh): distinct word n-gram shingles (n=5) per document."""
    docs = load(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(0)))
    return docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(idx, lambda i: F.array_join(F.slice(ws, i + F.lit(1), F.lit(n)), " "))
            )
        ).alias("sh"),
    )


# ------------------------------------------------------------- exact dedup

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groups; canonical = min doc_id."""
    docs = load(spark, sf_dir, "documents").select("doc_id", F.md5("text").alias("content_hash"))
    w = W.partitionBy("content_hash")
    return docs.withColumn(
        "is_canonical", (F.col("doc_id") == F.min("doc_id").over(w)).cast("int")
    ).withColumn("group_size", F.count(F.lit(1)).over(w))


SQL_DEDUP_EXACT = """
    SELECT doc_id, md5(text) AS content_hash,
           CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text)) THEN 1 ELSE 0 END AS is_canonical,
           count(*) OVER (PARTITION BY md5(text)) AS group_size
    FROM documents
"""


# --------------------------------------------------------- MinHash-LSH dedup

_N_HASHES = 8
_BAND_SIZE = 2  # 4 bands × 2 rows


def _doc_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _word_shingles(spark, sf_dir)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"h{i}:"), F.col("sh")))).alias(f"mh{i}")
        for i in range(_N_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash banding: docs sharing ≥1 of 4 bands (2 minhashes each) →
    candidate pairs, re-scored with exact shingle Jaccard. The pair space
    never materializes — only band-bucket collisions do."""
    mh = _doc_minhash(spark, sf_dir)
    n_bands = _N_HASHES // _BAND_SIZE
    bands = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", F.lit(f"b{b}"),
                    *[F.col(f"mh{b * _BAND_SIZE + r}") for r in range(_BAND_SIZE)],
                )
            )
            for b in range(n_bands)
        ]
    )
    bucketed = mh.select("doc_id", F.explode(bands).alias("bucket")).distinct()
    cand = (
        bucketed.alias("a")
        .join(bucketed.alias("b"),
              (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = _word_shingles(spark, sf_dir)
    na = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id")) & (F.col("sa.sh") == F.col("sb.sh")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .fillna(0, ["n_inter"])
        .join(na.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(na.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
    )


def _minhash_sql() -> str:
    mh_cols = ",\n           ".join(
        f"min(md5('h{i}:' || sh)) AS mh{i}" for i in range(_N_HASHES)
    )
    n_bands = _N_HASHES // _BAND_SIZE
    band_exprs = ", ".join(
        "md5('b%d:' || %s)" % (b, " || '|' || ".join(f"mh{b * _BAND_SIZE + r}" for r in range(_BAND_SIZE)))
        for b in range(n_bands)
    )
    return f"""
    WITH sh AS ({_WORD_SHINGLES_SQL}),
    mh AS (SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id),
    bucketed AS (
      SELECT DISTINCT doc_id, UNNEST([{band_exprs}]) AS bucket FROM mh
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_inter
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT c.doc_a, c.doc_b,
           round(coalesce(i.n_inter, 0) * 1.0
                 / (ca.n_sh + cb.n_sh - coalesce(i.n_inter, 0)), 6) AS jaccard
    FROM cand c
    LEFT JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
    JOIN counts ca ON ca.doc_id = c.doc_a
    JOIN counts cb ON cb.doc_id = c.doc_b
    """


SQL_DEDUP_MINHASH = _minhash_sql()


# ---------------------------------------------------------------- SimHash

_SIMHASH_BITS = 16


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document from token md5s: bit b of the hash is
    the sign of Σ_tokens (2·bit_b(md5(token)) − 1). Same arithmetic in
    the oracle. Grouping by simhash gives near-dup buckets."""
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
    )
    h16 = F.conv(F.substring(F.md5("word"), 1, 4), 16, 10).cast("long")
    toks = toks.withColumn("h", h16)
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"s{b}")
            for b in range(_SIMHASH_BITS)
        ]
    )
    sim = None
    for b in range(_SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return bit_sums.select("doc_id", sim.cast("long").alias("simhash"))


def _simhash_sql() -> str:
    # hex→int for the first 4 md5 chars without conv(): digit lookup
    h = ("(strpos('0123456789abcdef', substr(md5(word),1,1)) - 1) * 4096 + "
         "(strpos('0123456789abcdef', substr(md5(word),2,1)) - 1) * 256 + "
         "(strpos('0123456789abcdef', substr(md5(word),3,1)) - 1) * 16 + "
         "(strpos('0123456789abcdef', substr(md5(word),4,1)) - 1)")
    sums = ", ".join(
        f"sum(((h // {1 << b}) % 2) * 2 - 1) AS s{b}" for b in range(_SIMHASH_BITS)
    )
    assemble = " + ".join(
        f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(_SIMHASH_BITS)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, t.word FROM (
        SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents
      ), LATERAL (SELECT UNNEST(ws) AS word) t WHERE t.word <> ''
    ),
    hashed AS (SELECT doc_id, {h} AS h FROM toks),
    bit_sums AS (SELECT doc_id, {sums} FROM hashed GROUP BY doc_id)
    SELECT doc_id, CAST({assemble} AS BIGINT) AS simhash FROM bit_sums
    """


SQL_DEDUP_SIMHASH = _simhash_sql()


# ------------------------------------------------- n-gram Jaccard (inverted index)

def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard near-dup pairs via inverted-index join on word
    5-gram shingles (no LSH approximation): pairs sharing ≥1 shingle,
    kept at jaccard ≥ 0.3."""
    sh = _word_shingles(spark, sf_dir)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        pairs.join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= 0.3)
        .select("doc_a", "doc_b", "jaccard")
    )


SQL_NGRAM_JACCARD = f"""
    WITH sh AS ({_WORD_SHINGLES_SQL}),
    counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(n_inter * 1.0 / (ca.n_sh + cb.n_sh - n_inter), 6) AS jaccard
    FROM pairs p
    JOIN counts ca ON ca.doc_id = p.doc_a
    JOIN counts cb ON cb.doc_id = p.doc_b
    WHERE round(n_inter * 1.0 / (ca.n_sh + cb.n_sh - n_inter), 6) >= 0.3
"""


# ------------------------------------------------------- document fingerprint

def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-k document fingerprint (k=3): concat of the 3 smallest shingle
    md5s — a compact rolling-hash-style signature; equal fingerprints ⇒
    near-identical prefix content."""
    sh = _word_shingles(spark, sf_dir).withColumn("hh", F.md5("sh"))
    w = W.partitionBy("doc_id").orderBy("hh")
    return (
        sh.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .groupBy("doc_id")
        .agg(F.concat_ws(":", F.sort_array(F.collect_list("hh"))).alias("fingerprint"))
    )


SQL_DOC_FINGERPRINT = f"""
    WITH sh AS ({_WORD_SHINGLES_SQL}),
    ranked AS (
      SELECT doc_id, md5(sh) AS hh,
             row_number() OVER (PARTITION BY doc_id ORDER BY md5(sh)) AS rk
      FROM sh
    )
    SELECT doc_id, string_agg(hh, ':' ORDER BY hh) AS fingerprint
    FROM ranked WHERE rk <= 3 GROUP BY doc_id
"""


# ------------------------------------------------------- language ID heuristic

_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "that", "for", "on"]


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language-ID heuristic; confusion counts vs the
    labeled lang column."""
    docs = load(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    hits = F.size(F.filter(ws, lambda x: F.lower(x).isin(_STOPWORDS)))
    ratio = hits / F.size(ws)
    return (
        docs.withColumn("predicted", F.when(ratio >= 0.08, "en").otherwise("other"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_SW_LIST = ", ".join(f"'{w}'" for w in _STOPWORDS)
SQL_LANG_ID = f"""
    WITH scored AS (
      SELECT lang,
             CASE WHEN len(list_filter(ws, x -> list_contains([{_SW_LIST}], lower(x)))) * 1.0
                       / len(ws) >= 0.08
                  THEN 'en' ELSE 'other' END AS predicted
      FROM (SELECT lang, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
            FROM documents)
    )
    SELECT lang, predicted, count(*) AS n_docs FROM scored GROUP BY 1, 2
"""


# ------------------------------------------------------------- quality score

def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document quality: token count, type/token ratio, mean
    word length, punctuation ratio → weighted score."""
    docs = load(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    n_tok = F.size(ws)
    n_distinct = F.size(F.array_distinct(ws))
    avg_len = F.aggregate(ws, F.lit(0), lambda acc, x: acc + F.length(x)) / n_tok
    punct = F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", "")) / F.length("text")
    score = (
        F.least(n_tok / 100.0, F.lit(1.0)) * 0.3
        + (n_distinct / n_tok) * 0.4
        + F.least(avg_len / 8.0, F.lit(1.0)) * 0.2
        + (1.0 - F.least(punct * 10.0, F.lit(1.0))) * 0.1
    )
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        # floor(x*1e4+0.5)/1e4, NOT round(): Spark rounds the shortest
        # decimal rendering (HALF_UP) while DuckDB rounds the binary
        # double — they disagree on exact .5 boundaries; floor over
        # identical doubles is bit-deterministic in both engines
        (F.floor((n_distinct / n_tok) * 10000.0 + 0.5) / 10000.0).alias("type_token_ratio"),
        (F.floor(score * 10000.0 + 0.5) / 10000.0).alias("quality_score"),
    )


SQL_QUALITY_SCORE = """
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_tokens,
           floor((len(list_distinct(ws)) * 1.0 / len(ws)) * 10000.0 + 0.5) / 10000.0 AS type_token_ratio,
           floor((
             least(len(ws) / 100.0, 1.0) * 0.3
             + (len(list_distinct(ws)) * 1.0 / len(ws)) * 0.4
             + least(list_aggregate(list_transform(ws, x -> length(x)), 'sum') * 1.0
                     / len(ws) / 8.0, 1.0) * 0.2
             + (1.0 - least(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                            * 1.0 / length(text) * 10.0, 1.0)) * 0.1) * 10000.0 + 0.5) / 10000.0 AS quality_score
    FROM (SELECT doc_id, text,
                 list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
          FROM documents)
"""


# --------------------------------------------------------------- token stats

def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per source: whitespace tokens + regex word-ish
    tokens (BPE-ish [a-z]+|[0-9]+|other — F5 analog)."""
    docs = load(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    bpe = F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))
    per_doc = docs.select("source", F.size(ws).alias("n_ws"), bpe.alias("n_bpe"))
    return per_doc.groupBy("source").agg(
        F.sum("n_ws").alias("total_ws_tokens"),
        F.sum("n_bpe").alias("total_bpe_tokens"),
        F.round(F.avg("n_ws"), 4).alias("avg_tokens_per_doc"),
    )


SQL_TOKEN_STATS = """
    SELECT source,
           CAST(sum(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))) AS BIGINT) AS total_ws_tokens,
           CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS total_bpe_tokens,
           round(avg(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))), 4)
             AS avg_tokens_per_doc
    FROM documents GROUP BY source
"""


# ------------------------------------------------- similarity search (cosine)

def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for query vectors vec_id < 10.
    Dot products in double precision via zip_with+aggregate (JVM-side,
    no Python). The 100 TB scale path partitions the corpus side and
    broadcasts the (small) query side — exactly this plan."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("q")
    )
    dot = F.aggregate(
        F.zip_with("q", "e", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))  # noqa: E731
    sims = (
        F.broadcast(queries)
        .crossJoin(emb)
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot / (norm(F.col("q")) * norm(F.col("e")))).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("query_id", "rk", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


SQL_EMBEDDING_TOPK = """
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe FROM emb WHERE vec_id < 10),
    sims AS (
      SELECT q.query_id, emb.vec_id AS neighbor_id,
             list_dot_product(q.qe, emb.e)
               / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(emb.e, emb.e))) AS sim
      FROM q CROSS JOIN emb WHERE q.query_id <> emb.vec_id
    )
    SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id, round(sim, 4) AS sim
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rk
          FROM sims)
    WHERE rk <= 5
"""


def q_embedding_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection LSH: hyperplanes = embeddings of vec_id 0-3;
    bucket = 4-bit sign pattern of the dot products. The scale path for
    ANN: candidate search only within a bucket."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    planes = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("plane_id"), F.col("e").alias("p")
    )
    dot = F.aggregate(
        F.zip_with("p", "e", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    bits = (
        F.broadcast(planes)
        .crossJoin(emb)
        .select("vec_id", "plane_id", F.when(dot >= 0, "1").otherwise("0").alias("bit"))
    )
    buckets = (
        bits.groupBy("vec_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("plane_id", "bit"))),
                    lambda s: s["bit"],
                ),
            ).alias("bucket")
        )
    )
    return buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vecs"))


SQL_EMBEDDING_LSH_BUCKETS = """
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    planes AS (SELECT vec_id AS plane_id, e AS p FROM emb WHERE vec_id < 4),
    bits AS (
      SELECT emb.vec_id, planes.plane_id,
             CASE WHEN list_dot_product(planes.p, emb.e) >= 0 THEN '1' ELSE '0' END AS bit
      FROM planes CROSS JOIN emb
    ),
    buckets AS (
      SELECT vec_id, string_agg(bit, '' ORDER BY plane_id) AS bucket
      FROM bits GROUP BY vec_id
    )
    SELECT bucket, count(*) AS n_vecs FROM buckets GROUP BY bucket
"""


# ------------------------------------------- connected components (CC oracle)

def _cc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic small graph over supplier keys: chains of 5 plus
    sparse cross-links — exercises chains AND merged components."""
    sup = load(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))
    e1 = sup.filter((F.col("k") % 5 != 0)).select(
        F.col("k").alias("src"), (F.col("k") + 1).alias("dst")
    )
    e2 = sup.filter((F.col("k") % 10 == 3)).select(
        F.col("k").alias("src"), (F.col("k") + 10).alias("dst")
    )
    nodes = sup.select(F.col("k").alias("n"))
    return (
        e1.union(e2)
        .join(nodes, F.col("dst") == F.col("n"), "inner")  # keep edges inside the node set
        .select(F.col("src").cast("long"), F.col("dst").cast("long"))
    )


def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's DataFrame-fixpoint CC vs a recursive-CTE oracle."""
    from .linking.components import connected_components

    edges = _cc_edges(spark, sf_dir)
    sup = load(spark, sf_dir, "supplier").select(F.col("s_suppkey").cast("long").alias("node"))
    comp = connected_components(edges)
    return (
        sup.join(comp, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


SQL_CONNECTED_COMPONENTS = """
    WITH nodes AS (SELECT s_suppkey AS k FROM supplier),
    e0 AS (
      SELECT k AS src, k + 1 AS dst FROM nodes WHERE k % 5 <> 0
      UNION ALL
      SELECT k AS src, k + 10 AS dst FROM nodes WHERE k % 10 = 3
    ),
    edges AS (
      SELECT src, dst FROM e0 WHERE dst IN (SELECT k FROM nodes)
      UNION
      SELECT dst AS src, src AS dst FROM e0 WHERE dst IN (SELECT k FROM nodes)
    ),
    reach AS (
      SELECT k AS a, k AS b FROM nodes
      UNION
      SELECT r.a, e.dst AS b
      FROM reach r JOIN edges e ON r.b = e.src
    )
    SELECT CAST(a AS BIGINT) AS node, CAST(min(b) AS BIGINT) AS component
    FROM reach GROUP BY a
"""
SQL_CONNECTED_COMPONENTS = "WITH RECURSIVE " + SQL_CONNECTED_COMPONENTS.lstrip()[len("WITH "):]


# ----------------------------- M12: Word2Vec embedding training (rows-only)

def q_word2vec_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M12 (wod2vec_embedding.py:27-47): Word2Vec trained at scale with
    pyspark.ml (seeded, 1 partition for determinism at this size).
    Rows-only driver check (SGD training is not ANSI-SQL-expressible)."""
    from pyspark.ml.feature import Word2Vec

    docs = load(spark, sf_dir, "documents").select(
        F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("tokens")
    )
    w2v = Word2Vec(
        vectorSize=32, minCount=2, seed=42, numPartitions=1,
        inputCol="tokens", outputCol="vec",
    )
    model = w2v.fit(docs)
    return model.getVectors().select("word", F.col("vector").cast("string").alias("vector"))


# ------------------------------- multimodal feature extraction (rows-only)

def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns → deterministic features via mapInPandas
    (codec step stubbed — operators/multimodal.py). The contract query
    serializes the feature array to a sortable scalar (the driver's row
    canonicalization cannot sort list cells); internal callers use
    extract_features directly and keep the array<float> column."""
    from .operators.multimodal import extract_features, synthesize_media

    feats = extract_features(synthesize_media(spark, n=120))
    return feats.select(
        "media_id", "kind", "n_bytes",
        F.concat_ws(
            ",", F.transform("features", lambda x: F.format_number(x, 4))
        ).alias("features_csv"),
    )


# ----------------------- DNRTI reference-corpus evaluation (rows-only)

def q_dnrti_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon induced from the DNRTI train split → tag test split →
    reference eval metrics (token accuracy, weighted F1, span P/R/F1)."""
    import os

    from .kernel.weights import build_weights
    from .operators import conll
    from .tagging import tag_token_frames

    schema = ("accuracy double, n_tokens long, weighted_f1 double, "
              "precision double, recall double, f1 double")
    base = "/root/reference/DNRTI_Dataset"
    if not os.path.exists(f"{base}/test.txt"):
        return spark.createDataFrame([], schema)
    train = conll.map_dnrti_tags(conll.read_conll(spark, f"{base}/train.txt"))
    test = conll.map_dnrti_tags(conll.read_conll(spark, f"{base}/test.txt")).cache()
    lex = conll.induce_lexicon(train)
    sc = spark.sparkContext
    pred = tag_token_frames(
        test.select("doc_id", "sent_id", "tokens"),
        sc.broadcast(build_weights()), sc.broadcast(lex),
    ).cache()
    m = conll.evaluate_tags(pred, test)
    prf = conll.span_prf(conll.extract_span_rows(pred), conll.extract_span_rows(test))
    return m.crossJoin(prf.select("precision", "recall", "f1"))


# -------------------------- embedding-cosine near-duplicate detection

def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: sign-projection LSH bucketing (planes =
    first 4 vectors) then exact double-precision cosine within buckets,
    threshold 0.45. The 100 TB path: candidate generation is the bucket
    equi-join — the O(n²) pair space never materializes."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    planes = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("plane_id"), F.col("e").alias("p")
    )
    dot_pe = F.aggregate(F.zip_with("p", "e", lambda a, b: a * b), F.lit(0.0),
                         lambda acc, x: acc + x)
    bits = (
        F.broadcast(planes).crossJoin(emb)
        .select("vec_id", "plane_id", F.when(dot_pe >= 0, "1").otherwise("0").alias("bit"))
    )
    bucketed = bits.groupBy("vec_id").agg(
        F.concat_ws("", F.transform(
            F.sort_array(F.collect_list(F.struct("plane_id", "bit"))), lambda s: s["bit"]
        )).alias("bucket")
    ).join(emb, "vec_id")
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    dot_ab = F.aggregate(
        F.zip_with(F.col("a.e"), F.col("b.e"), lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))  # noqa: E731
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (dot_ab / (norm(F.col("a.e")) * norm(F.col("b.e")))).alias("sim"),
        )
        .filter(F.col("sim") >= 0.45)
        .select("vec_a", "vec_b", F.round("sim", 4).alias("sim"))
    )


SQL_EMBEDDING_NEARDUP = """
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    planes AS (SELECT vec_id AS plane_id, e AS p FROM emb WHERE vec_id < 4),
    bits AS (
      SELECT emb.vec_id, planes.plane_id,
             CASE WHEN list_dot_product(planes.p, emb.e) >= 0 THEN '1' ELSE '0' END AS bit
      FROM planes CROSS JOIN emb
    ),
    bucketed AS (
      SELECT b.vec_id, string_agg(bit, '' ORDER BY plane_id) AS bucket, any_value(e.e) AS e
      FROM bits b JOIN emb e ON b.vec_id = e.vec_id GROUP BY b.vec_id
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 4) AS sim
    FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= 0.45
"""


# ---------------------- grouped-map applyInPandas (per-group model fit)

def q_per_source_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().applyInPandas — the grouped-map API surface: per-source
    z-score normalization of document lengths computed inside a pandas
    group function (population std), verified against the window-function
    oracle."""
    import pandas as pd

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=0)
        z = (pdf["n_chars"] - mu) / sd if sd > 0 else pdf["n_chars"] * 0.0
        import numpy as np

        return pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "source": pdf["source"],
            "z": np.floor(z * 10000.0 + 0.5) / 10000.0,
        })

    return docs.groupBy("source").applyInPandas(zscore, "doc_id long, source string, z double")


SQL_PER_SOURCE_ZSCORE = """
    SELECT doc_id, source,
           floor(CASE WHEN stddev_pop(n_chars) OVER w > 0
                      THEN (n_chars - avg(n_chars) OVER w) / stddev_pop(n_chars) OVER w
                      ELSE 0.0 END * 10000.0 + 0.5) / 10000.0 AS z
    FROM documents
    WINDOW w AS (PARTITION BY source)
"""


# -------------------------------------------------- data-quality audit

def q_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations-style audit over the corpus-feed table: per-rule
    violation counts in ONE pass (conditional aggregation — no per-rule
    scans). The pattern a 100 TB ingest gate runs before training-data
    jobs consume a drop."""
    docs = load(spark, sf_dir, "documents")
    rules = {
        "null_text": F.col("text").isNull(),
        "empty_text": F.col("text").isNotNull() & (F.length("text") == 0),
        "bad_lang": ~F.col("lang").isin("en", "de", "fr", "es", "zh"),
        "n_chars_mismatch": F.col("n_chars") != F.length("text"),
        "negative_id": F.col("doc_id") < 0,
        "dup_doc_id": F.lit(False),  # checked separately below
    }
    audit = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(cond.cast("long")).alias(name) for name, cond in rules.items() if name != "dup_doc_id"],
    )
    dups = load(spark, sf_dir, "documents").groupBy("doc_id").count().filter("count > 1").count()
    out = audit.withColumn("dup_doc_id", F.lit(dups).cast("long"))
    # long format: (rule, violations)
    names = ["null_text", "empty_text", "bad_lang", "n_chars_mismatch", "negative_id", "dup_doc_id"]
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return out.selectExpr("n_rows", f"stack({len(names)}, {stack}) as (rule, violations)")


SQL_DATA_QUALITY_AUDIT = """
    WITH audit AS (
      SELECT count(*) AS n_rows,
             CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
             CAST(sum(CASE WHEN text IS NOT NULL AND length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_text,
             CAST(sum(CASE WHEN lang NOT IN ('en','de','fr','es','zh') THEN 1 ELSE 0 END) AS BIGINT) AS bad_lang,
             CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_mismatch,
             CAST(sum(CASE WHEN doc_id < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_id
      FROM documents
    ),
    dups AS (
      SELECT count(*) AS dup_doc_id FROM (
        SELECT doc_id FROM documents GROUP BY doc_id HAVING count(*) > 1)
    )
    SELECT n_rows, t.rule, t.violations
    FROM audit, dups,
    LATERAL (VALUES ('null_text', null_text), ('empty_text', empty_text),
                    ('bad_lang', bad_lang), ('n_chars_mismatch', n_chars_mismatch),
                    ('negative_id', negative_id), ('dup_doc_id', dup_doc_id)) t(rule, violations)
"""
