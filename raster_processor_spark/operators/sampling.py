"""Deterministic sampling for training-data curation.

Two primitives a data pipeline needs constantly and Spark's built-in
``df.sample`` cannot give (it is seed-and-partitioning dependent, so
reruns, resumes, and engine twins disagree):

  * rate sampling   — keep a per-stratum fraction by hashing the row KEY
    through an integer mix and thresholding: membership is a pure function
    of (key, rate), stable under repartitioning, restarts, and incremental
    appends (a doc's fate never changes as the corpus grows — the property
    that makes train/eval splits reproducible);
  * exact-k sampling — per-stratum top-k by the same hash order (a
    deterministic reservoir): `row_number() OVER (stratum ORDER BY mix)`,
    one shuffle, the distributed analogue of reservoir sampling with a
    frozen random tape.

The mix must be identical in Spark and DuckDB. xxhash64 exists only in
Spark, so the engine uses three LCG rounds mod the Mersenne prime 2^31-1
(the same int64-safe arithmetic family as the minhash permutations in
operators/dedup.py: every product stays < 2^62, no overflow in either
engine). Three rounds decorrelate the low bits from sequential keys — one
round of (a*k+b) mod P maps consecutive ids to an arithmetic progression,
which a `% 1000` threshold would sample with visible stripes.

At 10^12 rows: rate sampling is a narrow codegen filter (no shuffle at
all); exact-k shuffles (stratum, mix) pairs only — both trivially scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from raster_processor_spark.sources.tables import read_parquet as _read_parquet

MIX_P = 2147483647  # Mersenne prime 2^31-1 (int64-safe products)
MIX_ROUNDS = ((1103515245, 12345), (69069, 362437), (1664525, 1013904223))


def _mix_col(key):
    k = F.pmod(key.cast("long"), F.lit(MIX_P))
    for a, b in MIX_ROUNDS:
        k = F.pmod(k * F.lit(a) + F.lit(b), F.lit(MIX_P))
    return k


def _mix_sql(key: str) -> str:
    expr = f"(({key}) % {MIX_P})"
    for a, b in MIX_ROUNDS:
        expr = f"(({expr} * {a} + {b}) % {MIX_P})"
    return expr


def rate_sample(
    spark: SparkSession, sf_dir: str, permille: int = 200
) -> DataFrame:
    """Keep ~permille/1000 of documents — membership a pure function of
    doc_id (no shuffle, no seed, append-stable)."""
    d = _read_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    keep = F.pmod(_mix_col(F.col("doc_id")), F.lit(1000)) < permille
    return d.where(keep).select("doc_id", "source", "n_chars")


def rate_sample_sql(permille: int = 200) -> str:
    return f"""
SELECT doc_id, source, n_chars
FROM documents
WHERE ({_mix_sql("doc_id")}) % 1000 < {permille}
"""


def exact_k_sample(
    spark: SparkSession, sf_dir: str, k: int = 10
) -> DataFrame:
    """Exactly min(k, |stratum|) docs per source, chosen by hash order —
    the deterministic reservoir. One shuffle on (source)."""
    d = _read_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    mix = _mix_col(F.col("doc_id"))
    w = Window.partitionBy("source").orderBy(mix.asc(), F.col("doc_id").asc())
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("doc_id", "source", F.col("rn").cast("long").alias("pick_rank"))
    )


def exact_k_sample_sql(k: int = 10) -> str:
    mix = _mix_sql("doc_id")
    return f"""
WITH r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY {mix} ASC, doc_id ASC) AS rn
  FROM documents
)
SELECT doc_id, source, CAST(rn AS BIGINT) AS pick_rank
FROM r WHERE rn <= {k}
"""


# ----------------------------------------------------- temperature sample ---

def temperature_sample(
    spark: SparkSession, sf_dir: str, alpha_permille: int = 500,
    frac_permille: int = 500,
) -> DataFrame:
    """Temperature-based source resampling — the alpha-weighted source
    mixing step of a pretraining pipeline: per-source keep probability
    p_s ∝ n_s^(alpha-1) scaled so the expected kept total is
    frac_permille/1000 of the corpus (capped at 1 for tiny sources —
    without replacement, a source cannot up-sample). alpha < 1 flattens the
    source distribution toward uniform; alpha = 1 is plain rate sampling.

    Deterministic end-to-end: membership is the same hash-threshold as
    rate_sample with a per-source threshold floor(p_s * 1e6), and p_s comes
    from a closed-form over the tiny per-source count table (one sqrt and
    two divisions in a FIXED op order, identical in DuckDB). Plan shape:
    corpus-scale work is one groupBy(source) count + one broadcast join +
    a narrow filter — no windows, no second corpus shuffle."""
    assert alpha_permille == 500, (
        "only alpha = 1/2 is cross-engine exact (n^0.5 is IEEE sqrt, "
        "correctly rounded in both engines; pow() is not)"
    )
    frac = frac_permille / 1000.0
    d = _read_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    # z integerizes each sqrt at 1e-9 before the SUM so the (tiny) source
    # table's sum is order-immune across engines
    t = c.agg(
        (
            F.sum(F.round(F.sqrt(F.col("n").cast("double")) * 1e9)) / 1e9
        ).alias("z"),
        F.sum("n").alias("total"),
    )
    p = F.least(
        F.lit(1.0),
        F.col("total").cast("double") * F.lit(frac) / F.col("z")
        / F.sqrt(F.col("n").cast("double")),
    )
    rates = c.crossJoin(F.broadcast(t)).select(
        "source", F.floor(p * 1000000.0).cast("long").alias("p_micro")
    )
    keep = F.pmod(_mix_col(F.col("doc_id")), F.lit(1000000)) < F.col("p_micro")
    return (
        d.join(F.broadcast(rates), "source")
        .where(keep)
        .select("doc_id", "source", "p_micro")
    )


def temperature_sample_sql(
    alpha_permille: int = 500, frac_permille: int = 500
) -> str:
    assert alpha_permille == 500
    frac = frac_permille / 1000.0
    mix = _mix_sql("doc_id")
    return f"""
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
t AS (SELECT SUM(ROUND(SQRT(CAST(n AS DOUBLE)) * 1000000000.0)) / 1000000000.0 AS z,
             SUM(n) AS total FROM c),
r AS (SELECT source,
             CAST(FLOOR(LEAST(1.0,
                    CAST(total AS DOUBLE) * {frac} / z
                    / SQRT(CAST(n AS DOUBLE))) * 1000000.0)
                  AS BIGINT) AS p_micro
      FROM c, t)
SELECT d.doc_id, d.source, r.p_micro
FROM documents d JOIN r USING (source)
WHERE {mix} % 1000000 < r.p_micro
"""
