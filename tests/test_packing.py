"""Sequence-packing invariants: bins never exceed capacity, every doc is
assigned exactly once, the stratum window is the only shuffle, and the
realized fill ratio beats the 2x power-of-two worst case on real data."""

from __future__ import annotations

from pyspark.sql import functions as F

from raster_processor_spark.operators import packing as pk

SF = "/root/testdata/sf0.01"


def test_bins_never_overflow_and_cover_all_docs(spark):
    a = pk.pack_assignments(spark, SF).cache()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert a.count() == n_docs
    assert a.select("doc_id").distinct().count() == n_docs

    per_bin = a.groupBy("source", "size_class", "bin_id").agg(
        F.sum("n_tokens").alias("tok"),
        F.sum(F.col("size_class")).alias("slots"),
        F.max("overflow").alias("ovf"),
    )
    # non-overflow bins respect capacity in SLOT units by construction and
    # therefore in tokens too (n_tokens <= size_class per doc)
    bad = per_bin.where(
        (F.col("ovf") == 0) & (F.col("slots") > pk.CAPACITY)
    ).count()
    assert bad == 0
    bad_tok = per_bin.where(
        (F.col("ovf") == 0) & (F.col("tok") > pk.CAPACITY)
    ).count()
    assert bad_tok == 0
    a.unpersist()


def test_fill_ratio_beats_power_of_two_floor(spark):
    # sf0.1 so strata actually contain several bins (at sf0.01 every
    # stratum is one mostly-empty bin and the ratio measures corpus size,
    # not packing quality)
    st = pk.pack_stats(spark, "/root/testdata/sf0.1")
    row = st.agg(
        (F.sum("sum_tokens") / F.sum(F.col("n_bins") * pk.CAPACITY)).alias("r")
    ).collect()[0]
    # power-of-two slots guarantee >= 50% fill for FULL bins; partial last
    # bins per stratum dilute that — 0.4 corpus-wide is the honest floor
    assert row["r"] > 0.4


def test_pack_stats_fill_ratio_bounded_and_bins_distinct(spark):
    # overflow docs (n_tokens > capacity) report as their own stratum and the
    # fill numerator caps at capacity, so no stratum can exceed 1.0; n_bins
    # must count distinct ids (max+1 over-counts interleave gaps when salted)
    cap = 64
    st = pk.pack_stats(spark, SF, capacity=cap, salt_splits=3).collect()
    assert all(r.fill_ratio <= 1.0 + 1e-12 for r in st), st
    ovf = [r for r in st if r.overflow == 1]
    assert ovf, "expected an overflow stratum at capacity=64"
    for r in ovf:
        # 1-per-bin packing: bins == docs, ratio exactly 1.0 (capped)
        assert r.n_bins == r.n_docs and abs(r.fill_ratio - 1.0) < 1e-12


def test_pack_stats_oracle_parity_salted(spark, duck):
    from tests.conftest import SF_ORACLE

    got = sorted(
        tuple(r) for r in pk.pack_stats(spark, SF_ORACLE, salt_splits=3).collect()
    )
    want = sorted(tuple(r) for r in duck.sql(pk.pack_stats_sql(salt_splits=3)).fetchall())
    assert got == want and len(got) > 0


def test_single_exchange_in_assignment_plan(spark):
    plan = pk.pack_assignments(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_salted_packing_keeps_invariants(spark):
    """salt_splits > 1 (the hot-stratum skew breaker) must preserve every
    packing invariant: full coverage, no bin-id collisions across salts,
    no overflow, and the window partitions by (stratum, salt)."""
    a = pk.pack_assignments(spark, SF, salt_splits=4).cache()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert a.count() == n_docs

    per_bin = a.groupBy("source", "size_class", "bin_id").agg(
        F.sum(F.col("size_class")).alias("slots"),
        F.max("overflow").alias("ovf"),
    )
    assert per_bin.where(
        (F.col("ovf") == 0) & (F.col("slots") > pk.CAPACITY)
    ).count() == 0

    plan = (
        pk.pack_assignments(spark, SF, salt_splits=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "salt" in plan  # the rank window includes the salt key
    a.unpersist()
