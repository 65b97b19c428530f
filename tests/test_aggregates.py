"""Reference-fidelity checks for the per-cell aggregation kernels on planted
edge cases the sf fixtures may not reach — in particular the reference's
zero-denominator dark_frac branch (raster_agg.py:266-269: an all-dark cell
has dark area > 0 but composite total area 0, and must yield 0, not 1).
Both twins (Spark Column and DuckDB SQL) are checked on the same rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from raster_processor_spark.operators import aggregates as agg

INTERIOR = [4, 7]
EDGE = [3, 6]
DARK = [5]

# (cell_id, classification, pixel_area, water_frac)
PLANTED = [
    (1, 5, 10.0, 0.0),  # all-dark cell: dark_area 10, total 0 -> 0.0
    (1, 5, 2.5, 0.0),
    (2, 4, 8.0, 0.0),   # interior-only cell: no dark -> 0.0
    (3, 5, 4.0, 0.0),   # mixed: dark 4, interior 8 + edge 6*0.5 -> 4/11
    (3, 4, 8.0, 0.0),
    (3, 3, 6.0, 0.5),
    (4, 1, 9.0, 0.3),   # land-only cell: no dark, no composite -> 0.0
    (5, 3, 6.0, 0.0),   # dark + zero-water-frac edge: total still 0 -> 0.0
    (5, 5, 1.0, 0.0),
]


def test_ifgram_flatten_coherence_semantics(spark):
    # identical aligned phasors -> coherence exactly 1; rotation by the
    # rational phasor preserves modulus (|z_flat| == |z|); opposite phasors
    # cancel -> coherence 0
    import math

    from pyspark.sql import functions as F

    rows = [
        # cell 1: two identical vectors, t=0 (identity) -> coherence 1
        (1, 30.0, 40.0, 0),
        (1, 30.0, 40.0, 0),
        # cell 2: z and -z -> coherent sum 0
        (2, 30.0, 40.0, 0),
        (2, -30.0, -40.0, 0),
        # cell 3: one vector rotated by t=2 phasor: modulus must stay 50
        (3, 30.0, 40.0, 2),
    ]
    df = spark.createDataFrame(rows, "cell INT, re DOUBLE, im DOUBLE, t INT")
    re, im, t = F.col("re"), F.col("im"), F.col("t")
    c, s, d = 1 - t * t, 2 * t, 1 + t * t
    sr = F.sum((re * c + im * s) * 10 / d)
    si = F.sum((im * c - re * s) * 10 / d)
    pw = F.sum(F.round(F.sqrt(re * re + im * im) * 1000))
    mag = F.sqrt(sr * sr + si * si)
    out = {
        r.cell: (r.coh, r.m)
        for r in df.groupBy("cell")
        .agg(((mag / 10.0) / (pw / 1000.0)).alias("coh"), (mag / 10.0).alias("m"))
        .collect()
    }
    assert abs(out[1][0] - 1.0) < 1e-12
    assert abs(out[2][0]) < 1e-12 and abs(out[2][1]) < 1e-12
    assert abs(out[3][1] - 50.0) < 1e-9 and abs(out[3][0] - 1.0) < 1e-6
    assert math.isfinite(out[3][0])


def test_composite_area_variance_kernel_twins_agree(spark, duck):
    # (cell, cls, area, wfu, dadh, hvar, pfd, pmd) — interior, edge, dark mix
    rows = [
        (1, 4, 10.0, 0.05, 0.2, 0.03, 0.04, 0.02),
        (1, 3, 20.0, 0.08, 0.1, 0.05, 0.01, 0.09),
        (1, 5, 30.0, 0.02, 0.3, 0.02, 0.05, 0.05),  # dark: contributes 0
        (2, 7, 40.0, 0.03, 0.0, 0.04, 0.00, 0.00),
    ]
    schema = (
        "cell_id INT, classification INT, pixel_area DOUBLE, wfu DOUBLE, "
        "dadh DOUBLE, hvar DOUBLE, pfd DOUBLE, pmd DOUBLE"
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        r.cell_id: r.v
        for r in df.groupBy("cell_id")
        .agg(
            agg.composite_area_variance(
                F.col("classification"), F.col("pixel_area"), F.col("wfu"),
                F.col("dadh"), F.col("hvar"), F.col("pfd"), F.col("pmd"),
                INTERIOR, EDGE, "v",
            )
        )
        .collect()
    }
    # DuckDB parses bare float literals as DECIMAL — cast each to DOUBLE
    vals = ", ".join(
        "(" + ", ".join(
            [str(r[0]), str(r[1])] + [f"CAST('{x}' AS DOUBLE)" for x in r[2:]]
        ) + ")"
        for r in rows
    )
    sql = (
        "SELECT cell_id, "
        + agg.composite_area_variance_sql(
            "classification", "pixel_area", "wfu", "dadh", "hvar",
            "pfd", "pmd", INTERIOR, EDGE, "v",
        )
        + f" FROM (SELECT * FROM (VALUES {vals}) AS t(cell_id, classification,"
        " pixel_area, wfu, dadh, hvar, pfd, pmd)) GROUP BY 1"
    )
    oracle = {c: v for c, v in duck.sql(sql).fetchall()}
    assert got.keys() == oracle.keys()
    for c in got:
        assert abs(got[c] - oracle[c]) < 1e-9, (c, got[c], oracle[c])
    # hand-check one cell: interior 10² * (pfd(1-pfd)+pmd(1-pmd)) + dadh²·hvar
    want1 = (
        100.0 * (0.04 * 0.96 + 0.02 * 0.98) + 0.04 * 0.03
        + (20.0 * 0.08) ** 2 + 0.01 * 0.05
    )
    assert abs(got[1] - want1) < 1e-9


def test_dark_frac_zero_denominator_matches_reference(spark, duck):
    df = spark.createDataFrame(
        PLANTED, "cell_id INT, classification INT, pixel_area DOUBLE, water_frac DOUBLE"
    )
    got = {
        r.cell_id: r.dark_frac
        for r in df.groupBy("cell_id")
        .agg(
            agg.dark_frac(
                F.col("classification"), F.col("pixel_area"), F.col("water_frac"),
                DARK, INTERIOR, EDGE, "dark_frac",
            )
        )
        .collect()
    }
    want = {1: 0.0, 2: 0.0, 3: 4.0 / 11.0, 4: 0.0, 5: 0.0}
    assert got.keys() == want.keys()
    for c in want:
        assert abs(got[c] - want[c]) < 1e-12, (c, got[c], want[c])

    rows = ", ".join(f"({c}, {k}, {a}, {w})" for c, k, a, w in PLANTED)
    sql = (
        "SELECT cell_id, "
        + agg.dark_frac_sql(
            "classification", "pixel_area", "water_frac",
            DARK, INTERIOR, EDGE, "dark_frac",
        )
        + f" FROM (SELECT * FROM (VALUES {rows}) "
        "AS t(cell_id, classification, pixel_area, water_frac)) GROUP BY 1"
    )
    oracle = {c: v for c, v in duck.sql(sql).fetchall()}
    assert oracle.keys() == got.keys()
    for c in got:
        assert abs(oracle[c] - got[c]) < 1e-12, (c, oracle[c], got[c])
