"""The north-rule launch path: the flagship pipeline must run via
`spark-submit --py-files <engine.zip>` with the package resolved ONLY from
the shipped zip (BASELINE.json north_rule: "run via spark-submit --py-files
on a multi-executor cluster"). This drives the real launcher binary in a
subprocess — the same invocation BENCH/scaling.py uses per parallelism
level."""

from __future__ import annotations

import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin() -> str:
    import shutil

    import pyspark

    for cand in (
        shutil.which("spark-submit"),
        os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"),
    ):
        if cand and os.path.exists(cand):
            return cand
    raise RuntimeError("spark-submit not found")


def test_spark_submit_pyfiles_pipeline(tmp_path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "package_pyfiles", os.path.join(REPO, "bin", "package_pyfiles.py")
    )
    pkgmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pkgmod)
    zip_path = pkgmod.make_pyfiles_zip(str(tmp_path / "rps.zip"))

    images = str(tmp_path / "images.parquet")
    work = str(tmp_path / "work")
    env = dict(os.environ)
    # keep the subprocess JVM small; the test corpus is tiny
    env["SPARK_GRAFT_DRIVER_MEM"] = "4g"
    res = subprocess.run(
        [
            _spark_submit_bin(),
            "--master", "local[4]",
            "--driver-memory", "4g",
            "--py-files", zip_path,
            os.path.join(REPO, "bin", "run_images_pipeline.py"),
            images, work, "--gen", "5000", "--passes", "1",
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=str(tmp_path),  # NOT the repo root: the zip must supply the pkg
        env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    assert lines, res.stdout[-2000:]
    out = json.loads(lines[-1])
    assert out["cpus"] == 4
    assert out["full"]["images_decoded"] == 5000
    assert out["full"]["rows"] > 5000  # tiles + join rows
    assert out["full"]["rows_per_sec"] > 0
    # resumable snapshots were committed under the work dir
    snaps = os.listdir(os.path.join(work, "snap_4_t0"))
    assert "stats" in snaps and "tiles" in snaps
