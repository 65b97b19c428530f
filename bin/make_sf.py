#!/usr/bin/env python
"""Deterministic bench-scale synthesis: build sfN from sf0.1 by REP
key-shifted replicas (REP = N/0.1). Bench-only data — the correctness
oracle always runs at sf0.01 against the driver-generated tables; this
exists to measure the engine's scale TREND (the sf0.1 numbers are codegen-
dominated; see BENCH/BASELINE.md).

Replica construction (fully deterministic, no RNG):
  * key columns shift by rep * STRIDE (all derived keys stay unique and
    the hash-georeferencing spreads replicas to new positions);
  * document text gets every 5th word suffixed with the replica index, so
    replicas are NOT near-duplicates of each other (Jaccard ~ 0.35) and
    the dedup workload scales like a natural corpus instead of a
    pathological 10-way duplicate cluster;
  * embeddings get a per-(replica, dim) deterministic perturbation of
    <= 5e-4, so ANN indexes see 10 loose clusters per original vector,
    not 10 exact copies.
Small dims (region nation customer supplier part) are copied as-is.

Usage: python bin/make_sf.py [N] [out_dir]   (default N=1 → .benchdata/sf1)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from raster_processor_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
STRIDE = 1 << 33


def replicate(df, reps: int, shifts: dict[str, int], extra=None):
    out = None
    for rep in range(reps):
        r = df
        for col, stride in shifts.items():
            r = r.withColumn(col, F.col(col) + F.lit(rep * stride))
        if extra is not None:
            r = extra(r, rep)
        out = r if out is None else out.unionByName(r)
    return out


def main() -> None:
    n = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    reps = max(1, round(n / 0.1))
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".benchdata",
            f"sf{n:g}",
        )
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      app_name="make_sf")

    def w(df, name):
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: {df.count()} rows")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    w(replicate(li, reps, {"l_orderkey": STRIDE}), "lineitem")

    od = spark.read.parquet(f"{SRC}/orders.parquet")
    w(replicate(od, reps, {"o_orderkey": STRIDE, "o_custkey": STRIDE}), "orders")

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    w(replicate(ev, reps, {"event_id": STRIDE, "user_id": STRIDE}), "events")

    def perturb_text(r, rep):
        if rep == 0:
            return r
        words = F.split(F.col("text"), " ")
        rewritten = F.array_join(
            F.transform(
                words,
                lambda wd, i: F.when(
                    F.pmod(i + rep, F.lit(5)) == 0,
                    F.concat(wd, F.lit(f"_{rep}")),
                ).otherwise(wd),
            ),
            " ",
        )
        return r.withColumn("text", rewritten).withColumn(
            "n_chars", F.length(rewritten)
        )

    dc = spark.read.parquet(f"{SRC}/documents.parquet")
    w(replicate(dc, reps, {"doc_id": STRIDE}, perturb_text), "documents")

    def perturb_vec(r, rep):
        if rep == 0:
            return r
        return r.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, i: (
                    x
                    + (
                        F.pmod(
                            F.lit(rep) * 1315423911 + i * 2654435761,
                            F.lit(1000),
                        )
                        - 500
                    ).cast("float")
                    / F.lit(1000000.0).cast("float")
                ).cast("float"),
            ),
        )

    em = spark.read.parquet(f"{SRC}/embeddings.parquet")
    w(replicate(em, reps, {"vec_id": STRIDE}, perturb_vec), "embeddings")

    for t in ["region", "nation", "customer", "supplier", "part"]:
        src = f"{SRC}/{t}.parquet"
        dst = f"{out_dir}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copyfile(src, dst)
        print(f"{t}: copied")
    spark.stop()
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
