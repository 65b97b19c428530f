"""Deterministic-sampling invariants: membership is partitioning-independent,
exact-k yields exactly k per stratum, and the realized rate tracks the
requested rate."""

from __future__ import annotations

from pyspark.sql import functions as F

from raster_processor_spark.operators import sampling as smp

SF = "/root/testdata/sf0.01"


def test_rate_sample_stable_under_repartitioning(spark):
    a = set(r.doc_id for r in smp.rate_sample(spark, SF).collect())
    d = spark.read.parquet(f"{SF}/documents.parquet").repartition(13, "source")
    keep = F.pmod(smp._mix_col(F.col("doc_id")), F.lit(1000)) < 200
    b = set(r.doc_id for r in d.where(keep).select("doc_id").collect())
    assert a == b and len(a) > 0


def test_rate_sample_rate_is_near_nominal(spark):
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    k = smp.rate_sample(spark, SF).count()
    assert 0.1 < k / n < 0.3  # nominal 0.2


def test_exact_k_per_stratum(spark):
    out = smp.exact_k_sample(spark, SF, k=10)
    per = out.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()
    strata = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    sizes = {r.source: r.n for r in strata}
    assert len(per) == len(sizes)
    for r in per:
        assert r.c == min(10, sizes[r.source])


def test_rate_sample_no_shuffle(spark):
    plan = (
        smp.rate_sample(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
