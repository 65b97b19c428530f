"""Cell-local kNN via sorted ring expansion (north star: "cell-local kNN via
sorted H3 k-ring expansion"; reference analogue: nearest-cell gather,
geoloc_raster.py:72-76, and nearest-grid interpolation,
make_raster_region_maps.py:112-117).

Algorithm — ONE declarative plan, zero driver coordination:

  1. assign every point its quadcell at a density-chosen resolution
     (quadcells are square in degrees, so a Chebyshev ring R bounds
     euclidean distance: any point outside disk(R) is > R*s away);
  2. for ring radius R in an escalating schedule: explode each unresolved
     query's disk(R) offsets, equi-join candidates on cell id, then ONE
     window pass computes rank, candidate count, and the kth distance —
     a query is resolved iff it has >= k candidates AND its kth distance is
     strictly inside R*s (the correctness guarantee);
  3. the unresolved tail (sparse regions) falls back to a broadcast
     brute-force pass — bounded, tiny at scale.

The escalation runs phase by phase: each phase's accepted set is
materialized once via an eager localCheckpoint (see _phase_result) and the
next phase's input is the previous queries anti-joined against its resolved
keys; the phases union into the output plan over the materialized blocks.
When the first ring resolves everything the later phases' inputs are empty
and their jobs are no-ops. There are no per-round count()/isEmpty() driver
round-trips beyond the phase materializations themselves (each is one job;
the round-5 fully-lazy form instead re-ran each phase's rank window once
per consumer).

Distance: planar squared degrees (dx*dx + dy*dy) — a single-rounding double
expression, bit-identical in Spark / DuckDB / numpy, deterministic ties by
neighbor key. At 10^12 scale the candidate join is an equi-join on cell ids
co-located by the tiling partitioning; disk(R) explode multiplies the QUERY
side only, and each ring round is one shuffle (rank/count/kth fuse into a
single Exchange). The brute tail is a BroadcastNestedLoopJoin on the query
side only (never a CartesianProduct), safe because ring escalation bounds it
to sparse-region stragglers.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from raster_processor_spark import cellindex as ci


# Constant offset tables (pure literals — no files, no data): creating the
# local relation costs ~30 ms of py4j/conversion per call, and each kNN
# invocation needs 2-4 of them. Memoized per (application, grid, ring);
# keyed by applicationId so a restarted in-process session (tests) never
# sees a relation bound to a stopped context.
_OFFSETS_MEMO: dict[tuple, DataFrame] = {}


def _offsets_df(spark, grid: str, rows: list, schema: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, grid)
    df = _OFFSETS_MEMO.get(key)
    if df is None:
        df = spark.createDataFrame(rows, schema)
        _OFFSETS_MEMO[key] = df
    return df


def _disk_offsets_df(spark, ring: int) -> DataFrame:
    offs = ci.quad_disk_offsets(ring)
    return _offsets_df(
        spark, f"quad{ring}",
        [(int(dy), int(dx)) for dy, dx in offs], "dy BIGINT, dx BIGINT",
    )


_ROW_COUNT_MEMO: dict[str, tuple[object, int]] = {}


def parquet_row_count(path: str) -> int:
    """Exact row count from parquet FOOTERS only — no data scan, no Spark
    job (pyarrow sums row-group counts from file metadata). This is the
    same lineage a snapshot manifest records (sources/snapshots.py), used
    to feed density heuristics without doubling input I/O. Memoized
    against the path's on-disk state (same treatment as the schema memo in
    sources/tables.py): the count of an unchanged file set is pure
    metadata, and several queries re-derive it multiple times per
    invocation."""
    from raster_processor_spark.sources.tables import _path_state

    state = _path_state(path)
    hit = _ROW_COUNT_MEMO.get(path)
    if hit is not None and hit[0] == state:
        return hit[1]
    import pyarrow.dataset as ds

    n = ds.dataset(path, format="parquet").count_rows()
    _ROW_COUNT_MEMO[path] = (state, n)
    return n


def density_res(n: int) -> int:
    """Quadcell resolution for ~0.6 points per cell (see knn_join)."""
    return max(2, min(12, int(math.log2(max(n, 16) / 0.6) / 2)))


def _quad_bin_sqls(res: int) -> tuple[str, str, int, int]:
    """(ybin sql, xbin sql, ny, nx) — clamped lat rows, wrapped lon cols,
    as SQL strings (same double arithmetic as the round-5 Column builders;
    string assembly is O(1) py4j calls per stage)."""
    ny, nx = 1 << res, 1 << (res + 1)
    yb = (
        f"LEAST(GREATEST(CAST(FLOOR((lat + 90.0D) / 180.0D * {ny})"
        f" AS BIGINT), 0L), {ny - 1}L)"
    )
    xb = (
        f"LEAST(GREATEST(CAST(FLOOR((lon + 180.0D) / 360.0D * {nx})"
        f" AS BIGINT), 0L), {nx - 1}L)"
    )
    return yb, xb, ny, nx


def _quad_bin_cols(res: int):
    """(ybin expr, xbin expr, ny, nx) — Column view of _quad_bin_sqls."""
    yb, xb, ny, nx = _quad_bin_sqls(res)
    return F.expr(yb), F.expr(xb), ny, nx


def indexed_corpus(points: DataFrame, res: int) -> DataFrame:
    """(nkey, nlat, nlon, cell) — the kNN corpus side with its composite
    quadcell id (cell = ybin*nx + xbin, bijective with the (ybin, xbin)
    pair). This is the table a write-time bucketed layout commits ONCE per
    (corpus, res): every later kNN candidate join scans it bucket-aligned
    with zero Exchange on the corpus side (see knn_join corpus_table)."""
    yb, xb, _ny, nx = _quad_bin_sqls(res)
    return points.selectExpr(
        "key AS nkey", "lat AS nlat", "lon AS nlon",
        f"({yb}) * {nx} + ({xb}) AS cell",
    )


# Hot-cell split (two-level quadtree): a cell whose occupancy exceeds
# HOT_CELL_CAP makes ring candidates QUADRATIC in its membership (measured:
# the fixture's hot box at sf1 put ~625 points/cell at the density-chosen
# res → 26M ring-3 candidates for 50k queries, 500+ per query). Queries in
# hot cells re-run the SAME exact ring algorithm at a finer resolution
# (res + HOT_RES_DELTA → 64x more cells over the hot region); each branch
# is independently exact (ring escalation + brute tail), so the union is
# too. The occupancy table is one map-side-combined agg over the corpus
# and the hot-cell set is a broadcast — at 10^12 points this is the
# density-adaptive indexing a uniform grid cannot avoid.
HOT_CELL_CAP = 64
HOT_RES_DELTA = 3
# The split's fixed cost (occupancy scan + a second branch in the plan)
# only pays once a hot cell's quadratic term can dominate: with ~10% of
# points in a hot box, extra candidates ~ (0.1 n)^2 crosses the ring
# schedule's own cost around n ~ 2*10^4. Below the gate the base schedule
# is strictly faster and its worst case is bounded by a small n^2.
HOT_SPLIT_MIN_ROWS = 16384


def _run_branches(concurrent: bool, *thunks):
    """Run the independent hot/sparse branch builders, overlapped when the
    eager-checkpoint form is in use (each builder executes its phase jobs
    at build time; two driver threads let the scheduler back-fill one
    branch's scheduling tail with the other's tasks — guide §2.6 shape).
    Sequential when lazy (no build-time jobs to overlap)."""
    if not concurrent:
        return tuple(t() for t in thunks)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return tuple(f.result() for f in futures)


def _phase_result(got: DataFrame, checkpoint: bool) -> DataFrame:
    """Materialize one ring phase's accepted set (or leave it lazy).

    The accepted set has TWO consumers — the output union and the next
    phase's anti-join derivation — and with a lazy plan each consumer
    re-runs the rank window over the candidate join (the Exchange is
    reused, the window is not; measured 0.2-0.4 s per kNN query at sf0.1).
    ``localCheckpoint(eager=True)`` runs each phase once at plan-build time
    (the same build-time-execution contract weighted_percentile_distributed
    already has) and truncates the downstream plan. The blocks are
    k·|queries| rows of 4 scalars, are NOT CacheManager entries (the
    stateless test still holds), and are released by ContextCleaner as soon
    as the caller drops the returned DataFrame — per-query-bounded, unlike
    the round-3 persist leak. ``checkpoint=False`` keeps the fully lazy
    single-plan form (used by plan-shape tests that must SEE the candidate
    join in the final plan)."""
    return got.localCheckpoint(eager=True) if checkpoint else got


def _ring_phases_quad(
    spark, queries, corpus_join, res: int, rings: tuple[int, ...], k: int,
    checkpoint: bool = True, n_exact: int | None = None,
):
    """Run the escalating ring schedule at one resolution. ``queries`` has
    (key, lat, lon, ybin, xbin) binned at ``res``; returns (accepted rows
    (qkey, nkey, dist2, rank) or None, unresolved queries — or None when
    the schedule PROVABLY resolved every query).

    ``n_exact``: the exact query count, when the caller knows it (parquet
    footer metadata / an eager count — never an estimate). An accepted
    query contributes exactly k rows (row_number <= k gated on _cnt >= k),
    so once the phases' accepted row count reaches n_exact*k every query is
    resolved and the remaining phases (and the caller's brute tail) are
    dead plan weight — each one a scheduled no-op job plus py4j/codegen
    cost. The count() per phase runs over that phase's already-materialized
    localCheckpoint blocks (~tens of ms), so the check is free relative to
    one skipped phase (measured: the full sf0.1 quad corpus resolves in
    ring 3, making ring 12 + tail ~0.5 s of pure overhead per invocation)."""
    s = 180.0 / (1 << res)
    ny, nx = 1 << res, 1 << (res + 1)
    unresolved = queries
    accepted: DataFrame | None = None
    resolved_total = 0
    for ring in rings:
        offs = _disk_offsets_df(spark, ring)
        # SQL-string plan assembly (one py4j call per stage instead of one
        # per expression node — the dedup_simhash lesson; the parsed plan
        # is identical) and EARLY projection: only (qkey, nkey, dist2)
        # enter the rank window's exchange — the round-5 form shuffled
        # qlat/qlon/nlat/nlon/cell through it as dead weight (guide §2.3).
        q = unresolved.selectExpr(
            "key AS qkey", "lat AS qlat", "lon AS qlon", "ybin", "xbin"
        )
        # explode the query side by disk offsets (lon wraps, lat clamps)
        probes = (
            q.crossJoin(F.broadcast(offs))
            .selectExpr(
                "qkey", "qlat", "qlon",
                "ybin + dy AS nyb", f"pmod(xbin + dx, {nx}) AS nxb",
            )
            .where(f"nyb >= 0 AND nyb < {ny}")
            .selectExpr("qkey", "qlat", "qlon", f"nyb * {nx} + nxb AS cell")
        )
        cand = probes.join(corpus_join, ["cell"], "inner").where("qkey != nkey")
        scored = cand.selectExpr(
            "qkey", "nkey",
            "(nlon - qlon) * (nlon - qlon) + (nlat - qlat) * (nlat - qlat)"
            " AS dist2",
        )
        # ONE shuffle: rank + count + kth-distance over the same partitioning
        limit = (ring * s) * (ring * s)
        ranked = scored.selectExpr(
            "qkey", "nkey", "dist2",
            "row_number() OVER (PARTITION BY qkey"
            " ORDER BY dist2 ASC, nkey ASC) AS rank",
            "count(1) OVER (PARTITION BY qkey) AS _cnt",
        ).selectExpr(
            "qkey", "nkey", "dist2", "rank", "_cnt",
            f"max(CASE WHEN rank <= {k} THEN dist2 END)"
            " OVER (PARTITION BY qkey) AS _kth",
        )
        # the accepted set is referenced twice (output union + next phase's
        # anti-join derivation) — materialize it once per phase, see
        # _phase_result
        got = _phase_result(
            ranked.where(
                f"_cnt >= {k} AND _kth < {limit!r}D AND rank <= {k}"
            ).select("qkey", "nkey", "dist2", "rank"),
            checkpoint,
        )
        accepted = got if accepted is None else accepted.unionByName(got)
        if checkpoint and n_exact is not None:
            resolved_total += got.count()
            if resolved_total == n_exact * k:
                return accepted, None
        resolved_keys = got.select(F.col("qkey").alias("key")).distinct()
        unresolved = unresolved.join(resolved_keys, "key", "left_anti")
    return accepted, unresolved


def knn_join(
    points: DataFrame,
    k: int,
    res: int | None = None,
    rings: tuple[int, ...] = (3, 12),
    n_hint: int | None = None,
    corpus_table: str | None = None,
    corpus_table_fine: str | None = None,
    hot_cap: int | None = HOT_CELL_CAP,
    checkpoint: bool = True,
) -> DataFrame:
    """points: DataFrame(key, lat, lon) → (key, neighbor_key, dist2, rank).

    ``res`` defaults to a density heuristic (~0.6 points per cell; the
    default disk(3) = 49-cell first phase then resolves nearly every query
    in one round, and the ring-12 second phase — empty in the common case —
    bounds the brute tail at corpus scale). The row count feeding the
    heuristic comes from ``n_hint`` (parquet_row_count / snapshot manifest
    — metadata only); only when the caller supplies neither ``res`` nor
    ``n_hint`` does the function fall back to an eager pts.count(), which
    costs a full extra scan — avoid at scale. ``n_hint``, when provided,
    must be the EXACT row count (footer metadata and manifests are exact,
    never estimates): besides the density heuristic it feeds the
    provably-resolved short-circuit (see _ring_phases_quad) that elides
    later ring phases and the brute tail once the materialized phases hold
    n*k accepted rows — an undercount would silently drop unresolved
    queries from the result.

    Each ring's accepted set feeds the final union AND the next phase's
    anti-join; by default each phase is materialized once at build time
    via an eager localCheckpoint (see _phase_result — 0.2-0.4 s faster per
    query than the round-5 ReusedExchange form, per-query-bounded blocks,
    CacheManager stays empty). ``checkpoint=False`` restores the fully
    lazy single-plan form for plan-shape inspection."""
    spark = points.sparkSession
    pts = points.select("key", "lat", "lon")
    if res is None:
        # 2^(2res+1) cells total; aim for ~0.6 points per cell — with
        # disk(3) = 49 cells that is ~30 candidates per query, an order of
        # magnitude less window work than denser grids (measured 3-5x faster
        # than ~8/cell), and the ring escalation + brute tail keep the
        # result exact whatever the density guess
        n = n_hint if n_hint is not None else pts.count()
        res = density_res(n)
    else:
        n = n_hint

    ybin, xbin, ny, nx = _quad_bin_cols(res)
    indexed = pts.withColumn("ybin", ybin).withColumn("xbin", xbin)
    if corpus_table is not None:
        # write-time bucketed layout (sources/snapshots.bucketed_table on
        # "cell"): every ring phase's candidate join scans the corpus
        # bucket-aligned — ZERO Exchange on the corpus side, and the corpus
        # derivation (georeference + binning) is never recomputed. The
        # merge hint pins the sort-merge path so the layout is exercised
        # even at toy scale where a broadcast would otherwise win; at
        # corpus scale SMJ is the only viable plan anyway.
        corpus = spark.table(corpus_table)
        corpus_join = corpus.hint("merge")
    else:
        corpus = indexed_corpus(pts, res)
        corpus_join = corpus

    fres = min(12, res + HOT_RES_DELTA)
    split = hot_cap is not None and fres > res and (
        n is None or n >= HOT_SPLIT_MIN_ROWS
    )
    if split:
        # two-level quadtree: queries whose BASE cell is hot re-run the
        # same exact schedule at the finer level against the re-binned
        # corpus; both branches carry their own ring guarantee, so the
        # union is exact regardless of where the occupancy split falls
        occ = corpus.groupBy("cell").agg(F.count(F.lit(1)).alias("_occ"))
        hot_cells = occ.where(F.col("_occ") > hot_cap).select("cell")
        q_cell = indexed.withColumn("cell", F.col("ybin") * nx + F.col("xbin"))
        q_sparse = q_cell.join(F.broadcast(hot_cells), "cell", "left_anti").drop("cell")
        q_hot = q_cell.join(F.broadcast(hot_cells), "cell", "left_semi").drop(
            "cell", "ybin", "xbin"
        )
        fybin, fxbin, _fny, _fnx = _quad_bin_cols(fres)
        q_hot_f = q_hot.withColumn("ybin", fybin).withColumn("xbin", fxbin)
        if corpus_table_fine is not None:
            corpus_f = spark.table(corpus_table_fine).hint("merge")
        else:
            corpus_f = indexed_corpus(pts, fres)
        # the two branches are independent job chains until the union;
        # with eager phase materialization they would otherwise serialize
        # at build time, leaving the cluster idle through each phase's
        # scheduling tail — overlap them (guide-style concurrent actions;
        # Spark's FIFO scheduler back-fills the idle slots). The lazy form
        # has no build-time jobs, so it stays sequential.
        (acc_s, un_s), (acc_h, un_h) = _run_branches(
            checkpoint,
            lambda: _ring_phases_quad(
                spark, q_sparse, corpus_join, res, rings, k, checkpoint
            ),
            lambda: _ring_phases_quad(
                spark, q_hot_f, corpus_f, fres, rings, k, checkpoint
            ),
        )
        accepted = (
            acc_s.unionByName(acc_h)
            if acc_s is not None and acc_h is not None
            else (acc_s if acc_s is not None else acc_h)
        )
        cols = ["key", "lat", "lon"]
        unresolved = un_s.select(*cols).unionByName(un_h.select(*cols))
        # branch-level short-circuit (the per-branch query counts are
        # unknown, so the in-phase check cannot fire inside the branches):
        # one count over the branches' materialized blocks proves whether
        # the schedules jointly resolved every query — if so the brute tail
        # (and its anti-join derivation) is dead weight in the final plan
        if checkpoint and n is not None and accepted is not None:
            if accepted.count() == n * k:
                unresolved = None
    else:
        accepted, unresolved = _ring_phases_quad(
            spark, indexed, corpus_join, res, rings, k, checkpoint,
            n_exact=n if checkpoint else None,
        )

    if unresolved is not None:
        # brute-force tail for whatever the ring schedule left unresolved:
        # broadcast the query side (tiny by construction — sparse-region
        # stragglers only); AQE propagates the empty relation when there
        # are none
        q = unresolved.select(
            F.col("key").alias("qkey"),
            F.col("lat").alias("qlat"),
            F.col("lon").alias("qlon"),
        )
        cand = F.broadcast(q).crossJoin(
            corpus.select("nkey", "nlat", "nlon")
        ).where(F.col("qkey") != F.col("nkey"))
        dx = F.col("nlon") - F.col("qlon")
        dy2 = F.col("nlat") - F.col("qlat")
        w = Window.partitionBy("qkey").orderBy(
            F.col("dist2").asc(), F.col("nkey").asc()
        )
        tail = (
            cand.withColumn("dist2", dx * dx + dy2 * dy2)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qkey", "nkey", "dist2", "rank")
        )
        # rings=() => every query is in the brute tail, nothing was accepted
        accepted = tail if accepted is None else accepted.unionByName(tail)

    return accepted.select(
        F.col("qkey").alias("key"),
        F.col("nkey").alias("neighbor_key"),
        "dist2",
        F.col("rank").cast("long").alias("rank"),  # BIGINT like the oracle
    )


def _hex_bin_sqls(res: int) -> tuple[str, str]:
    """(qbin, rbin) cube-rounded axial hex bin expressions as SQL strings —
    the same double arithmetic the round-5 Column builders produced, but
    assembled with O(1) py4j calls (the dedup_simhash lesson) and parsed
    JVM-side. Codegen's subexpression elimination dedupes the textual
    repetition of qf/rf exactly as it deduped the shared Column nodes.

    Nearest-integer via FLOOR(+0.5), not ROUND: round() allocates a
    BigDecimal per value; the tie-break difference (half-away-from-zero vs
    half-up) is explicitly irrelevant here — cube rounding is exact under
    ANY tie-break, and both join sides use these same expressions."""
    s = repr(180.0 / (1 << res))
    s3 = repr(float(math.sqrt(3.0) / 3.0))
    two3 = repr(2.0 / 3.0)
    qf = f"(({s3}D * lon - lat / 3.0D) / {s}D)"
    rf = f"((lat * {two3}D) / {s}D)"
    sf = f"(-{qf} - {rf})"
    q0 = f"CAST(FLOOR({qf} + 0.5D) AS DOUBLE)"
    r0 = f"CAST(FLOOR({rf} + 0.5D) AS DOUBLE)"
    s0 = f"CAST(FLOOR({sf} + 0.5D) AS DOUBLE)"
    dq, dr, ds = (
        f"ABS({q0} - {qf})", f"ABS({r0} - {rf})", f"ABS({s0} - {sf})"
    )
    fix_q = f"({dq} > {dr} AND {dq} > {ds})"
    fix_r = f"((NOT {fix_q}) AND {dr} > {ds})"
    qbin = f"CAST(CASE WHEN {fix_q} THEN -{r0} - {s0} ELSE {q0} END AS BIGINT)"
    rbin = f"CAST(CASE WHEN {fix_r} THEN -{q0} - {s0} ELSE {r0} END AS BIGINT)"
    return qbin, rbin


def _hex_qbin(res: int):
    """Axial q of the cube-rounded hex cell as a pure codegen column (no
    UDF: the indexed table feeds every ring phase on both sides, so an
    Arrow stage here would run several times per query — measured 3x
    slower). See _hex_bin_sqls for the arithmetic and tie-break notes."""
    return F.expr(_hex_bin_sqls(res)[0])


def _hex_rbin(res: int):
    return F.expr(_hex_bin_sqls(res)[1])


def _hex_corpus(points: DataFrame, res: int) -> DataFrame:
    return points.select(
        F.col("key").alias("nkey"),
        F.col("lat").alias("nlat"),
        F.col("lon").alias("nlon"),
        _hex_qbin(res).alias("nqb"),
        _hex_rbin(res).alias("nrb"),
    )


# composite single-column hex cell id: axial coords are bounded by the
# lon/lat extents over the smallest cell size (res 12 → |q|,|r| < 2^13),
# so (q + 2^19) * 2^20 + (r + 2^19) is collision-free and keeps the
# candidate equi-join on ONE long key (same shape as the quad path)
_HEX_OFF = 1 << 19
_HEX_MUL = 1 << 20


def _ring_phases_hex(
    spark, queries, corpus, res: int, rings: tuple[int, ...], k: int,
    checkpoint: bool = True, n_exact: int | None = None,
):
    """Hex twin of _ring_phases_quad: same schedule, axial (q, r) keys and
    the hex separation bound (see knn_hex_join docstring). ``n_exact`` is
    the same provably-resolved short-circuit as the quad twin: once the
    materialized phases hold n_exact*k accepted rows, later phases and the
    caller's brute tail are skipped."""
    from raster_processor_spark import cellindex as ci_mod

    s = 180.0 / (1 << res)
    corpus_k = corpus.selectExpr(
        "nkey", "nlat", "nlon",
        f"(nqb + {_HEX_OFF}) * {_HEX_MUL} + nrb + {_HEX_OFF} AS cell",
    )
    unresolved = queries
    accepted: DataFrame | None = None
    resolved_total = 0
    for ring in rings:
        offs = _offsets_df(
            spark, f"hex{ring}",
            [(int(dq), int(dr)) for dq, dr in ci_mod.hex_disk_offsets(ring)],
            "dq BIGINT, dr BIGINT",
        )
        # SQL-string stages + early projection, mirroring _ring_phases_quad
        # (same plan, ~1 py4j call per stage, and only (qkey, nkey, dist2)
        # cross the rank window's exchange)
        q = unresolved.selectExpr(
            "key AS qkey", "lat AS qlat", "lon AS qlon", "qbin", "rbin"
        )
        probes = q.crossJoin(F.broadcast(offs)).selectExpr(
            "qkey", "qlat", "qlon",
            f"(qbin + dq + {_HEX_OFF}) * {_HEX_MUL}"
            f" + rbin + dr + {_HEX_OFF} AS cell",
        )
        cand = probes.join(corpus_k, ["cell"], "inner").where("qkey != nkey")
        scored = cand.selectExpr(
            "qkey", "nkey",
            "(nlon - qlon) * (nlon - qlon) + (nlat - qlat) * (nlat - qlat)"
            " AS dist2",
        )
        lim = (1.5 * (ring + 1) - 2.0) * s
        limit2 = lim * lim
        ranked = scored.selectExpr(
            "qkey", "nkey", "dist2",
            "row_number() OVER (PARTITION BY qkey"
            " ORDER BY dist2 ASC, nkey ASC) AS rank",
            "count(1) OVER (PARTITION BY qkey) AS _cnt",
        ).selectExpr(
            "qkey", "nkey", "dist2", "rank", "_cnt",
            f"max(CASE WHEN rank <= {k} THEN dist2 END)"
            " OVER (PARTITION BY qkey) AS _kth",
        )
        got = _phase_result(
            ranked.where(
                f"_cnt >= {k} AND _kth < {limit2!r}D AND rank <= {k}"
            ).select("qkey", "nkey", "dist2", "rank"),
            checkpoint,
        )
        accepted = got if accepted is None else accepted.unionByName(got)
        if checkpoint and n_exact is not None:
            resolved_total += got.count()
            if resolved_total == n_exact * k:
                return accepted, None
        resolved_keys = got.select(F.col("qkey").alias("key")).distinct()
        unresolved = unresolved.join(resolved_keys, "key", "left_anti")
    return accepted, unresolved


def knn_hex_join(
    points: DataFrame,
    k: int,
    res: int | None = None,
    rings: tuple[int, ...] = (3, 12),
    n_hint: int | None = None,
    hot_cap: int | None = HOT_CELL_CAP,
    checkpoint: bool = True,
) -> DataFrame:
    """kNN via H3-style hex k-ring expansion (the north star's literal
    phrasing) — same contract and EXACT same output as knn_join, different
    index geometry: points land in pointy-top axial hex cells
    (cellindex.hex_axial cube rounding, Arrow UDF), each phase explodes the
    unresolved queries by hex disk(R) offsets and equi-joins candidates on
    the (q, r) axial key.

    Resolution guarantee: hex centers at graph distance d are >=
    1.5*size*d apart (|c|^2 = 3*size^2*(q^2+qr+r^2) and q^2+qr+r^2 >=
    (3/4)*d^2 — tight at knight-move cells like (2,-1); enumeration test
    in tests/). Any point outside disk(R) sits in a cell at distance >=
    R+1 and each point is within one circumradius of its center, so its
    separation from the query is >= (1.5*(R+1) - 2)*size; a query resolves
    iff it has >= k candidates and its kth distance is strictly inside
    that bound. Unresolved stragglers fall through rings to the broadcast
    brute tail — exactness never depends on the density heuristic.
    ``n_hint`` must be exact when provided (same contract and
    provably-resolved short-circuit as knn_join). No
    longitude wrap (the hex grid is planar, matching the planar metric of
    the oracle; a wrapped near-dateline neighbor is far in the metric, so
    omitting wrapped candidates cannot change the answer)."""
    from raster_processor_spark import cellindex as ci_mod  # noqa: F401

    spark = points.sparkSession
    pts = points.select("key", "lat", "lon")
    if res is None:
        n = n_hint if n_hint is not None else pts.count()
        # ~0.6 points per hex cell NOMINALLY — then one level finer once
        # the corpus is large: points cluster in bands, so the occupancy
        # of OCCUPIED cells runs ~4x the global average, and hex cells are
        # 2.6x the area of quad cells at equal res (measured at the 10x
        # scale point: res+1 halves the ring-3 candidate volume while the
        # ring schedule still resolves >99% of sparse queries in the first
        # phase). Below the gate the coarser grid's candidate volume is
        # already small and the finer grid only adds unresolved stragglers.
        s_target = math.sqrt(64800.0 * 0.6 / (2.598 * max(n, 16)))
        bump = 1 if n >= HOT_SPLIT_MIN_ROWS else 0
        res = max(2, min(12, round(math.log2(180.0 / s_target)) + bump))
    else:
        n = n_hint
    indexed = pts.withColumn("qbin", _hex_qbin(res)).withColumn(
        "rbin", _hex_rbin(res)
    )
    corpus = _hex_corpus(pts, res)

    fres = min(12, res + HOT_RES_DELTA)
    if hot_cap is not None and fres > res and (
        n is None or n >= HOT_SPLIT_MIN_ROWS
    ):
        # two-level split mirroring knn_join: hex cells whose occupancy
        # exceeds the cap re-run the schedule at the finer hex level
        occ = corpus.groupBy("nqb", "nrb").agg(F.count(F.lit(1)).alias("_occ"))
        hot_cells = occ.where(F.col("_occ") > hot_cap).select(
            F.col("nqb").alias("qbin"), F.col("nrb").alias("rbin")
        )
        q_sparse = indexed.join(
            F.broadcast(hot_cells), ["qbin", "rbin"], "left_anti"
        )
        q_hot = indexed.join(
            F.broadcast(hot_cells), ["qbin", "rbin"], "left_semi"
        ).drop("qbin", "rbin")
        q_hot_f = q_hot.withColumn("qbin", _hex_qbin(fres)).withColumn(
            "rbin", _hex_rbin(fres)
        )
        corpus_f = _hex_corpus(pts, fres)
        # overlap the independent branch job chains — see _run_branches
        (acc_s, un_s), (acc_h, un_h) = _run_branches(
            checkpoint,
            lambda: _ring_phases_hex(
                spark, q_sparse, corpus, res, rings, k, checkpoint
            ),
            lambda: _ring_phases_hex(
                spark, q_hot_f, corpus_f, fres, rings, k, checkpoint
            ),
        )
        accepted = (
            acc_s.unionByName(acc_h)
            if acc_s is not None and acc_h is not None
            else (acc_s if acc_s is not None else acc_h)
        )
        cols = ["key", "lat", "lon"]
        unresolved = un_s.select(*cols).unionByName(un_h.select(*cols))
        # branch-sum short-circuit, mirroring knn_join (see there)
        if checkpoint and n is not None and accepted is not None:
            if accepted.count() == n * k:
                unresolved = None
    else:
        accepted, unresolved = _ring_phases_hex(
            spark, indexed, corpus, res, rings, k, checkpoint,
            n_exact=n if checkpoint else None,
        )

    if unresolved is not None:
        q = unresolved.select(
            F.col("key").alias("qkey"),
            F.col("lat").alias("qlat"),
            F.col("lon").alias("qlon"),
        )
        cand = F.broadcast(q).crossJoin(
            corpus.select("nkey", "nlat", "nlon")
        ).where(F.col("qkey") != F.col("nkey"))
        dx = F.col("nlon") - F.col("qlon")
        dy2 = F.col("nlat") - F.col("qlat")
        w = Window.partitionBy("qkey").orderBy(
            F.col("dist2").asc(), F.col("nkey").asc()
        )
        tail = (
            cand.withColumn("dist2", dx * dx + dy2 * dy2)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qkey", "nkey", "dist2", "rank")
        )
        accepted = tail if accepted is None else accepted.unionByName(tail)
    return accepted.select(
        F.col("qkey").alias("key"),
        F.col("nkey").alias("neighbor_key"),
        "dist2",
        F.col("rank").cast("long").alias("rank"),
    )


def knn_sql(points_sql: str, k: int) -> str:
    """DuckDB oracle: exact brute-force kNN with identical distance and ties.

    ``points_sql`` must yield (key, lat, lon).
    """
    return f"""
WITH pts AS ({points_sql}),
pairs AS (
  SELECT q.key AS key, n.key AS neighbor_key,
         (n.lon - q.lon) * (n.lon - q.lon) + (n.lat - q.lat) * (n.lat - q.lat) AS dist2
  FROM pts q CROSS JOIN pts n
  WHERE q.key <> n.key
),
ranked AS (
  SELECT key, neighbor_key, dist2,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY dist2 ASC, neighbor_key ASC) AS rank
  FROM pairs
)
SELECT key, neighbor_key, dist2, rank FROM ranked WHERE rank <= {k}
"""
