#!/usr/bin/env python
"""spark-submit job script for the flagship images pipeline (the north-rule
launch path):

    spark-submit --master local[N] \
        --py-files raster_processor_spark.zip \
        bin/run_images_pipeline.py <images_parquet> <work_dir> \
        [--gen N_IMAGES] [--passes WARMUP+TIMED] [--seed-stats DIR]

The engine package arrives ONLY via --py-files (this script deliberately
does not sys.path the repo): the same invocation, pointed at a cluster
master instead of local[N], distributes the zip to every executor — which
is the launch contract in BASELINE.json's north_rule ("run via
spark-submit --py-files ... at two cluster sizes").

Prints ONE JSON line: {"cpus": ..., "full": {"sec", "rows",
"images_decoded", "rows_per_sec", "images_per_sec"}} — the same shape
BENCH/scaling.py consumes.

Stages (plans/images_pipeline.py): georeference -> quad-cell tile
assignment (Arrow pandas UDF) -> worker-side columnar decode -> fused
per-cell aggregation -> two-phase point-in-polygon join -> zonal
aggregation, each committed as a resumable snapshot with per-partition
lineage.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("images_path")
    ap.add_argument("work_dir")
    ap.add_argument("--gen", type=int, default=0,
                    help="generate this many synthetic images first")
    ap.add_argument("--warmup", action="store_true",
                    help="run one untimed full pass before the timed passes")
    ap.add_argument("--passes", type=int, default=1,
                    help="timed passes (best-of reported)")
    ap.add_argument("--seed-stats", default=None,
                    help="resume decode from this committed stats snapshot")
    args = ap.parse_args()

    # imported here so a --py-files failure surfaces as the real error
    from raster_processor_spark import datagen
    from raster_processor_spark.plans import images_pipeline as pl
    from raster_processor_spark.session import get_spark_submitted

    spark = get_spark_submitted(app_name="rps_submit_pipeline")
    cpus = spark.sparkContext.defaultParallelism

    if args.gen:
        datagen.write_images(
            spark, args.gen, args.images_path,
            partitions=max(cpus * 6, 32),
        )

    def one_pass(tag: str) -> tuple[float, int, int]:
        out_root = os.path.join(args.work_dir, f"snap_{cpus}_{tag}")
        if os.path.exists(out_root):
            shutil.rmtree(out_root)
        if args.seed_stats:
            os.makedirs(out_root)
            shutil.copytree(args.seed_stats, os.path.join(out_root, "stats"))
        t0 = time.perf_counter()
        out = pl.run_pipeline(spark, args.images_path, out_root)
        rows = out["tiles"].count() + out["poly_pairs"].count()
        decoded = out["stats"].count()
        return time.perf_counter() - t0, rows, decoded

    if args.warmup:
        one_pass("warmup")
        os.sync()

    best: tuple[float, int, int] | None = None
    for i in range(args.passes):
        res = one_pass(f"t{i}")
        os.sync()
        if best is None or res[0] < best[0]:
            best = res
    assert best is not None
    dt, rows, decoded = best
    print(json.dumps({
        "cpus": cpus,
        "full": {
            "sec": dt,
            "rows": rows,
            "images_decoded": decoded,
            "rows_per_sec": rows / dt,
            "images_per_sec": decoded / dt,
        },
    }))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
