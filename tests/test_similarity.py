"""ANN quality checks: IVF recall against the exact brute-force baseline."""

from __future__ import annotations

from raster_processor_spark.operators import similarity as sim
from tests.conftest import SF_ORACLE


def test_ivf_recall_vs_brute(spark):
    k = 10
    brute = sim.ann_brute_topk(spark, SF_ORACLE, k, 25)
    ivf = sim.ann_ivf_topk(spark, SF_ORACLE, k, 25)
    b = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    v = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    assert len(b) > 0 and len(v) > 0
    recall = len(b & v) / len(b)
    # nprobe=3 of 10 clusters on clustered embeddings: solid but approximate
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ivf_deterministic(spark):
    a = sorted(map(tuple, sim.ann_ivf_topk(spark, SF_ORACLE, 5, 25).collect()))
    b = sorted(map(tuple, sim.ann_ivf_topk(spark, SF_ORACLE, 5, 25).collect()))
    assert a == b
