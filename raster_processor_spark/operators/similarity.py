"""Similarity search over embedding columns.

* brute-force cosine top-k — the exact baseline (JVM-side fold over the
  array column; no Python in the loop);
* IVF-bucketed ANN — cluster assignment (numpy pandas UDF) + probe-N search,
  the scale path: the candidate join touches only probed clusters.

Cosine arithmetic is a sequential left-fold with double casts, matching the
DuckDB oracle's list_reduce fold bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

DIM = 64


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double (bit-matches list_reduce)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _seq_dot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Dimension-ordered accumulation: acc = ((0 + p_1) + p_2) + ... — the
    same FP operation sequence as the SQL left-fold, vectorized across pairs
    (a: (na, d), b: (nb, d)) → (na, nb). np.dot would use pairwise/SIMD
    summation and break bit-parity with the oracle."""
    acc = np.zeros((a.shape[0], b.shape[0]), dtype=np.float64)
    for i in range(a.shape[1]):
        acc += a[:, i][:, None] * b[:, i][None, :]
    return acc


def _seq_norm2(a: np.ndarray) -> np.ndarray:
    acc = np.zeros(a.shape[0], dtype=np.float64)
    for i in range(a.shape[1]):
        acc += a[:, i] * a[:, i]
    return acc


def ann_brute_topk(
    spark: SparkSession, sf_dir: str, k: int, query_mod: int
) -> DataFrame:
    """Exact cosine top-k for the query subset (vec_id % query_mod == 0).

    The query matrix is tiny and broadcast (closure); the corpus streams
    through an Arrow-batched pandas UDF that emits only each batch's local
    top-k per query (a correct superset of the global top-k), then one
    window ranks globally. FP semantics bit-match the SQL fold (_seq_dot)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q_rows = (
        e.where(F.pmod(F.col("vec_id"), F.lit(query_mod)) == 0)
        .orderBy("vec_id")
        .collect()
    )
    qids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    qm = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in q_rows])
    qn = np.sqrt(_seq_norm2(qm))

    schema = "query_id BIGINT, neighbor_id BIGINT, cosine DOUBLE"

    def topk_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            nids = pdf["vec_id"].to_numpy(dtype=np.int64)
            nm = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            dots = _seq_dot(qm, nm)  # (nq, nb)
            nn = np.sqrt(_seq_norm2(nm))
            cos = dots / (qn[:, None] * nn[None, :])
            out_q, out_n, out_c = [], [], []
            for qi in range(len(qids)):
                mask = nids != qids[qi]
                cand_ids = nids[mask]
                cand_cos = cos[qi][mask]
                # batch-local top-k with the global tie order (-cos, id)
                order = np.lexsort((cand_ids, -cand_cos))[:k]
                out_q.append(np.full(len(order), qids[qi]))
                out_n.append(cand_ids[order])
                out_c.append(cand_cos[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine": np.concatenate(out_c),
                }
            )

    # the corpus often arrives as one parquet file → fan out before the UDF
    par = spark.sparkContext.defaultParallelism
    local = (
        e.select("vec_id", "embedding")
        .repartition(par)
        .mapInPandas(topk_batches, schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine",
                F.col("rank").cast("long").alias("rank"))
    )


def ann_brute_topk_sql(k: int, query_mod: int) -> str:
    def dot(a: str, b: str) -> str:
        return (
            f"list_reduce(list_transform(generate_series(1, {DIM}), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
        )

    cos = f"{dot('q.embedding', 'n.embedding')} / " \
          f"(sqrt({dot('q.embedding', 'q.embedding')}) * sqrt({dot('n.embedding', 'n.embedding')}))"
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {cos} AS cosine
  FROM embeddings q CROSS JOIN embeddings n
  WHERE q.vec_id % {query_mod} = 0 AND q.vec_id <> n.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
"""


def embedding_near_dup_pairs(
    spark: SparkSession, sf_dir: str, tau: float
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >= tau)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = a.crossJoin(b).where(F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.withColumn("cosine", cosine_col(F.col("ea"), F.col("eb")))
        .where(F.col("cosine") >= tau)
        .select("vec_a", "vec_b", "cosine")
    )


def embedding_near_dup_sql(tau: float) -> str:
    def dot(a: str, b: str) -> str:
        return (
            f"list_reduce(list_transform(generate_series(1, {DIM}), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
        )

    cos = f"{dot('a.embedding', 'b.embedding')} / " \
          f"(sqrt({dot('a.embedding', 'a.embedding')}) * sqrt({dot('b.embedding', 'b.embedding')}))"
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine
FROM embeddings a CROSS JOIN embeddings b
WHERE a.vec_id < b.vec_id AND {cos} >= {tau}
"""


def _nearest_centroid_udf(centroids: np.ndarray):
    """pandas UDF embedding → nearest centroid id (vectorized numpy argmax
    of cosine against the broadcast centroid matrix)."""
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf(IntegerType())
    def _assign(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for emb in it:
            m = np.stack(emb.to_numpy()).astype(np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            yield pd.Series(np.argmax(m @ cn.T, axis=1).astype(np.int32))

    return _assign


def ann_ivf_topk(
    spark: SparkSession, sf_dir: str, k: int, query_mod: int,
    centroid_mod: int = 50, nprobe: int = 3,
) -> DataFrame:
    """IVF ANN: corpus bucketed by nearest centroid; each query searches only
    its nprobe nearest clusters. Approximate by construction (deterministic;
    validated by recall against ann_brute_topk in tests)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent_rows = (
        e.where(F.pmod(F.col("vec_id"), F.lit(centroid_mod)) == 0)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    centroids = np.stack([np.asarray(r[0], dtype=np.float64) for r in cent_rows])
    assign = _nearest_centroid_udf(centroids)

    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        assign(F.col("embedding")).alias("cluster"),
    )
    qs = e.where(F.pmod(F.col("vec_id"), F.lit(query_mod)) == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    # probe clusters per query: top-nprobe centroid ids (numpy UDF per batch)
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf("array<int>")
    def _probes(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for emb in it:
            m = np.stack(emb.to_numpy()).astype(np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ cn.T
            idx = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
            yield pd.Series(list(idx))

    qp = qs.withColumn("cluster", F.explode(_probes(F.col("qe"))))
    cand = qp.join(corpus, "cluster").where(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.withColumn("cosine", cosine_col(F.col("qe"), F.col("ne")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine",
                F.col("rank").cast("long").alias("rank"))
    )
