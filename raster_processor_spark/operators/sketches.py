"""Distributed sketches with deterministic integer hashing.

Count-min sketch over a key column: depth d LCG hash rows x width w
buckets. The sketch build is ONE groupBy over (row, bucket) — mergeable
state (cell counts add), so it composes with the incremental-snapshot
layer — and the estimate for a key is min over rows of its bucket count.
Estimates are >= true counts (classic CMS one-sided error) and fully
deterministic (LCG constants are public-domain classics), so the whole
operator has a bit-exact DuckDB twin — unlike opaque HLL++ built-ins whose
internals differ across engines.

At 10^12 rows: the sketch is d*w cells regardless of input size (here
4x256); heavy-hitter estimation never shuffles the raw keys, only the
(row, bucket) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from raster_processor_spark.sources.tables import read_parquet as _read_parquet

CMS_DEPTH = 4
CMS_WIDTH = 256
# (a, b) LCG constants per row (same family as the minhash permutations)
CMS_HASHES: list[tuple[int, int]] = [
    (1103515245, 12345),
    (214013, 2531011),
    (69069, 362437),
    (1664525, 1013904223),
]
CMS_MOD = 2147483647


def _bucket_expr(key, a: int, b: int):
    return F.pmod(F.pmod(F.lit(a) * key + F.lit(b), F.lit(CMS_MOD)), F.lit(CMS_WIDTH))


def cms_build(df: DataFrame, key) -> DataFrame:
    """→ DataFrame(row, bucket, cnt): the sketch matrix (d*w cells max)."""
    parts = []
    for i, (a, b) in enumerate(CMS_HASHES):
        parts.append(
            df.select(F.lit(i).alias("row"), _bucket_expr(key, a, b).alias("bucket"))
        )
    allb = parts[0]
    for p in parts[1:]:
        allb = allb.unionByName(p)
    return allb.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_heavy_hitters(
    spark: SparkSession, sf_dir: str, min_est: int
) -> DataFrame:
    """Users whose CMS-estimated event count >= min_est, with the estimate
    and the exact count (one-sided error: est >= exact always)."""
    e = _read_parquet(spark, f"{sf_dir}/events.parquet").select("user_id")
    sketch = cms_build(e, F.col("user_id"))
    keys = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    probes = None
    for i, (a, b) in enumerate(CMS_HASHES):
        p = keys.select(
            "user_id",
            "exact_cnt",
            F.lit(i).alias("row"),
            _bucket_expr(F.col("user_id"), a, b).alias("bucket"),
        )
        probes = p if probes is None else probes.unionByName(p)
    est = (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    return est.where(F.col("est_cnt") >= min_est).select(
        "user_id", "est_cnt", "exact_cnt"
    )


def cms_heavy_hitters_sql(min_est: int) -> str:
    rows = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(CMS_HASHES))
    return f"""
WITH h AS (SELECT * FROM (VALUES {rows}) AS h(row, a, b)),
e AS (SELECT user_id FROM events),
cells AS (
  SELECT h.row AS row, ((h.a * user_id + h.b) % {CMS_MOD}) % {CMS_WIDTH} AS bucket,
         COUNT(*) AS cnt
  FROM e CROSS JOIN h GROUP BY 1, 2
),
keys AS (SELECT user_id, COUNT(*) AS exact_cnt FROM e GROUP BY 1),
probes AS (
  SELECT k.user_id, k.exact_cnt, h.row AS row,
         ((h.a * k.user_id + h.b) % {CMS_MOD}) % {CMS_WIDTH} AS bucket
  FROM keys k CROSS JOIN h
),
est AS (
  SELECT p.user_id, p.exact_cnt, MIN(c.cnt) AS est_cnt
  FROM probes p JOIN cells c ON c.row = p.row AND c.bucket = p.bucket
  GROUP BY 1, 2
)
SELECT user_id, CAST(est_cnt AS BIGINT) AS est_cnt,
       CAST(exact_cnt AS BIGINT) AS exact_cnt
FROM est WHERE est_cnt >= {min_est}
"""


# ------------------------------------------------------------------- HLL ----
# From-scratch HyperLogLog with a deterministic LCG hash: bucket = h % m,
# rank = leading-zero count of the remaining bits + 1 computed as
# (W_BITS + 1) - length(bin(w)) — pure integer/string ops, so Spark and
# DuckDB agree bit-for-bit (no log2 floor fragility). Registers merge with
# MAX — the sketch composes with incremental snapshots like CMS.

HLL_M = 64  # registers
HLL_A, HLL_B = 48271, 11
HLL_W_BITS = 25  # h < 2^31, bucket eats ~6 bits → w < 2^25
HLL_ALPHA = 0.709  # alpha_64 (published constant for m=64)


def hll_distinct(spark: SparkSession, sf_dir: str, key_col: str = "event_id") -> DataFrame:
    """One-row (n_est, n_exact) cardinality estimate of events.key_col."""
    e = _read_parquet(spark, f"{sf_dir}/events.parquet").select(key_col)
    h = F.pmod(F.lit(HLL_A) * F.col(key_col) + F.lit(HLL_B), F.lit(CMS_MOD))
    bucket = F.pmod(h, F.lit(HLL_M))
    w = (h / HLL_M).cast("long")
    rank = F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.bin(w))
    )
    regs = (
        e.select(bucket.alias("bucket"), rank.alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").alias("m_rank"))
    )
    # include absent registers as rank 0 (2^-0 = 1 each)
    summed = regs.agg(
        F.sum(1.0 / F.pow(F.lit(2.0), F.col("m_rank"))).alias("present_sum"),
        F.count(F.lit(1)).alias("n_present"),
    )
    est = (
        F.lit(float(HLL_ALPHA)) * HLL_M * HLL_M
        / (F.col("present_sum") + (F.lit(HLL_M) - F.col("n_present")))
    )
    exact = e.agg(F.countDistinct(key_col).alias("n_exact"))
    return summed.crossJoin(exact).select(
        F.round(est, 6).alias("n_est"), F.col("n_exact").cast("long").alias("n_exact")
    )


def hll_distinct_sql(key_col: str = "event_id") -> str:
    return f"""
WITH e AS (SELECT {key_col} AS k FROM events),
hashed AS (
  SELECT ({HLL_A} * k + {HLL_B}) % {CMS_MOD} AS h FROM e
),
ranked AS (
  SELECT h % {HLL_M} AS bucket,
         (CASE WHEN h // {HLL_M} = 0 THEN {HLL_W_BITS + 1}
               ELSE {HLL_W_BITS + 1} - length(printf('%b', h // {HLL_M}))
          END) AS rank
  FROM hashed
),
regs AS (SELECT bucket, MAX(rank) AS m_rank FROM ranked GROUP BY 1),
summed AS (
  SELECT SUM(1.0 / pow(2.0, m_rank)) AS present_sum, COUNT(*) AS n_present
  FROM regs
)
SELECT ROUND({HLL_ALPHA!r} * {HLL_M} * {HLL_M}
             / (present_sum + ({HLL_M} - n_present)), 6) AS n_est,
       (SELECT CAST(COUNT(DISTINCT k) AS BIGINT) FROM e) AS n_exact
FROM summed
"""
