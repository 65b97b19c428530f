"""Similarity search over embedding columns.

* brute-force cosine top-k — the exact baseline (cogrouped slice scoring
  with a broadcast-joined query set: no driver collect, slice-local top-k
  then one global rank window);
* IVF-bucketed ANN — cluster assignment (numpy pandas UDF) + probe-N search,
  the scale path: the candidate join touches only probed clusters. On this
  synthetic UNIFORM corpus recall tracks the probe fraction (no cluster
  structure to exploit), so the default nprobe is high; on real clustered
  corpora the same plan probes a small fraction.
* blocked exact near-dup join — full-recall thresholded similarity at
  matmul speed with bounded replication (no crossJoin).

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

    Fully distributed — the query set is a broadcast-joined DataFrame (never
    collected to the driver, so a corpus-proportional query set cannot OOM
    the driver). The corpus streams through a cogrouped applyInPandas that
    scores one (corpus-slice x full-query-broadcast) block per task with the
    bit-exact sequential fold and emits only each slice's local top-k per
    query (a correct superset of the global top-k); a final window ranks
    globally over n_slices*k rows per query."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    par = spark.sparkContext.defaultParallelism
    qs = e.where(F.pmod(F.col("vec_id"), F.lit(query_mod)) == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    corpus = (
        e.select("vec_id", "embedding")
        .withColumn("slice", F.pmod(F.xxhash64("vec_id"), F.lit(par)).cast("int"))
    )
    # replicate the query set once per corpus slice (broadcast nest-loop on
    # the tiny slice-id dim — the query VECTORS move through the shuffle as
    # a broadcast-joined side, not a driver closure)
    slices = spark.range(par).select(F.col("id").cast("int").alias("slice"))
    q_rep = qs.crossJoin(F.broadcast(slices))

    schema = "query_id BIGINT, neighbor_id BIGINT, cosine DOUBLE"

    def score_slice(key, qpdf, cpdf):
        if qpdf.empty or cpdf.empty:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        qids = qpdf["query_id"].to_numpy(dtype=np.int64)
        qm = np.stack(qpdf["qe"].to_numpy()).astype(np.float64)
        qn = np.sqrt(_seq_norm2(qm))
        nids = cpdf["vec_id"].to_numpy(dtype=np.int64)
        nm = np.stack(cpdf["embedding"].to_numpy()).astype(np.float64)
        cos = _seq_dot(qm, nm) / (qn[:, None] * np.sqrt(_seq_norm2(nm))[None, :])
        out_q, out_n, out_c = [], [], []
        for qi in range(len(qids)):
            mask = nids != qids[qi]
            cand_ids = nids[mask]
            cand_cos = cos[qi][mask]
            # slice-local top-k with the global tie order (-cos, id)
            order = np.lexsort((cand_ids, -cand_cos))[:k]
            out_q.append(np.full(len(order), qids[qi]))
            out_n.append(cand_ids[order])
            out_c.append(cand_cos[order])
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "cosine": np.concatenate(out_c),
            }
        )

    local = (
        q_rep.groupBy("slice")
        .cogroup(corpus.groupBy("slice"))
        .applyInPandas(score_slice, schema)
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
    spark: SparkSession, sf_dir: str, tau: float, n_blocks: int = 8
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >= tau).

    Blocked exact similarity join: at tau this low (near-orthogonal on
    64-dim data, with qualifying pairs straddling the threshold) no LSH /
    IVF candidate scheme can guarantee recall 1, so the scale design is to
    do the full O(n^2) FLOPs at vectorized speed with BOUNDED data movement
    instead of pretending to prune. Vectors are hashed into n_blocks blocks;
    the B(B+1)/2 block-pair work units each score one (block x block) tile
    in numpy inside applyInPandas and emit only pairs >= tau. Shuffle volume
    is n*(B+1) rows (each vector joins B+1 work units) — never the n^2 rows
    of a crossJoin — and per-task memory is two blocks plus one tile of the
    cosine matrix. At 100 TB, B scales ~ sqrt(n^2/mem) and the tile matmuls
    are the (unavoidable) compute floor. FP semantics bit-match the SQL fold
    (_seq_dot / _seq_norm2)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    blk = F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).cast("int")
    m = e.withColumn("blk", blk)
    wu = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "ba INT, bb INT",
    )
    rows_a = (
        F.broadcast(wu).join(m.withColumnRenamed("blk", "ba"), "ba")
        .select("ba", "bb", F.lit(0).alias("side"), "vec_id", "embedding")
    )
    rows_b = (
        F.broadcast(wu).join(m.withColumnRenamed("blk", "bb"), "bb")
        .select("ba", "bb", F.lit(1).alias("side"), "vec_id", "embedding")
    )
    both = rows_a.unionByName(rows_b)

    schema = "vec_a BIGINT, vec_b BIGINT, cosine DOUBLE"

    def score_tile(key, pdf):
        ba, bb = key
        a = pdf[pdf["side"] == 0]
        b = pdf[pdf["side"] == 1]
        if a.empty or b.empty:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        ida = a["vec_id"].to_numpy(dtype=np.int64)
        idb = b["vec_id"].to_numpy(dtype=np.int64)
        ma = np.stack(a["embedding"].to_numpy()).astype(np.float64)
        mb = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        cos = _seq_dot(ma, mb) / (
            np.sqrt(_seq_norm2(ma))[:, None] * np.sqrt(_seq_norm2(mb))[None, :]
        )
        ia, ib = np.where(cos >= tau)
        va, vb = ida[ia], idb[ib]
        if ba == bb:
            # both sides hold the same block: keep each unordered pair once
            keep = va < vb
        else:
            # disjoint blocks: each unordered pair appears exactly once;
            # normalize to vec_a < vec_b
            keep = np.ones(len(va), dtype=bool)
        va, vb, cv = va[keep], vb[keep], cos[ia, ib][keep]
        lo, hi = np.minimum(va, vb), np.maximum(va, vb)
        return pd.DataFrame({"vec_a": lo, "vec_b": hi, "cosine": cv})

    return both.groupBy("ba", "bb").applyInPandas(score_tile, schema)


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


def ann_ivf_topk_sql(
    k: int, query_mod: int, n_centroids: int = 16, nprobe: int = 12
) -> str:
    """DuckDB twin of ann_ivf_topk: same fixed centroid sample, same argmax
    cluster assignment (ties by centroid id — numpy argmax keeps the first
    max), same probe set, same fold-exact cosine and (cosine DESC, id ASC)
    tie order. The assignment/probe ORDERINGS compare numpy's normalized
    matmul against the SQL fold — equal up to ~1e-16, which only matters on
    exact centroid-cosine ties (continuous data: negligible, and exact
    duplicate vectors order identically anyway)."""

    def dot(a: str, b: str) -> str:
        return (
            f"list_reduce(list_transform(generate_series(1, {DIM}), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
        )

    def cos(a: str, b: str) -> str:
        return (
            f"{dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)}))"
        )

    return f"""
WITH cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS ce
  FROM embeddings ORDER BY vec_id LIMIT {n_centroids}
),
asg AS (
  SELECT e.vec_id, e.embedding, c.cid,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY {cos('e.embedding', 'c.ce')} DESC,
                                     c.cid ASC) AS r
  FROM embeddings e CROSS JOIN cent c
),
corpus AS (
  SELECT vec_id AS neighbor_id, embedding AS ne, cid AS cluster
  FROM asg WHERE r = 1
),
probes AS (
  SELECT q.vec_id AS query_id, q.embedding AS qe, c.cid AS cluster,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY {cos('q.embedding', 'c.ce')} DESC,
                                     c.cid ASC) AS pr
  FROM embeddings q CROSS JOIN cent c
  WHERE q.vec_id % {query_mod} = 0
),
scored AS (
  SELECT p.query_id, n.neighbor_id, {cos('p.qe', 'n.ne')} AS cosine
  FROM probes p JOIN corpus n ON p.cluster = n.cluster
  WHERE p.pr <= {nprobe} AND p.query_id <> n.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
"""


def ann_ivf_topk(
    spark: SparkSession, sf_dir: str, k: int, query_mod: int,
    n_centroids: int = 16, nprobe: int = 12,
) -> DataFrame:
    """IVF ANN: corpus bucketed by nearest centroid; each query searches only
    its nprobe nearest clusters. Approximate by construction (deterministic;
    validated by recall >= 0.9 against ann_brute_topk in tests).

    The centroid set is a FIXED-size deterministic sample (first n_centroids
    by vec_id) — the driver pull is O(n_centroids), independent of corpus
    size (at real scale you'd seed k-means|| the same way). Queries stay a
    distributed DataFrame throughout."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent_rows = (
        e.orderBy("vec_id").limit(n_centroids).select("embedding").collect()
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
