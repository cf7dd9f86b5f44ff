"""Recall of the bucketed (IVF-shaped) kNN vs the exact brute-force
path — approximate operators need a measured quality number, not just
'it runs' (the coarse 8-seed quantizer on random-ish fixture vectors is
a weak partitioner, so the floor here is deliberately modest; a trained
k-means quantizer with multi-probe raises it)."""

from __future__ import annotations

from flink_streaming_example_spark.plans.registry import all_specs

SF_DIR = "/root/testdata/sf0.01"


def test_ivf_recall_vs_exact(spark):
    specs = all_specs()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in specs["q_knn_cosine"].fn(spark, SF_DIR).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in specs["q_knn_ivf"].fn(spark, SF_DIR).collect()
    }
    assert len(exact) == 50  # 10 queries x top-5
    recall = len(exact & approx) / len(exact)
    # deterministic (fixed seeds, fixed fixtures): measured 0.78 at
    # sf0.01 — far above the ~1% random baseline; floor set with margin
    assert len(approx) == 50
    assert recall >= 0.5, f"IVF recall collapsed: {recall:.2f}"
    print(f"IVF recall@5 vs exact: {recall:.2f}")


def test_lsh_buckets_and_recall(spark):
    """q_knn_lsh: top-3-in-bucket hits must overlap the exact top-5
    far above the ~1% random-pair baseline (measured 7/30 at sf0.01
    with 4 planes; floor set with margin), and results must exist —
    a degenerate all-one-bucket signature would silently fall back to
    brute force, an over-fine one would return nothing."""
    specs = all_specs()
    exact_top5 = {
        (r["query_id"], r["neighbor_id"])
        for r in specs["q_knn_cosine"].fn(spark, SF_DIR).collect()
    }
    lsh = specs["q_knn_lsh"].fn(spark, SF_DIR).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in lsh}
    # <=10 queries x top-3; sparse buckets may cut a query short
    assert 0 < len(approx) <= 30
    hit = len(approx & exact_top5)
    assert hit / len(approx) >= 0.1, f"LSH precision collapsed: {hit}/{len(approx)}"


def test_pq_adc_recall(spark):
    """q_knn_pq: ADC top-5 from 8-code seeded codebooks must beat the
    ~1% random baseline by an order of magnitude (measured 0.20 at
    sf0.01 — modest by design: K=8 seeded codes per subspace and an
    L2 ADC against a cosine ground truth; Lloyd-trained codebooks and
    K=256 raise it) and return a full result set."""
    specs = all_specs()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in specs["q_knn_cosine"].fn(spark, SF_DIR).collect()
    }
    pq = {
        (r["query_id"], r["neighbor_id"])
        for r in specs["q_knn_pq"].fn(spark, SF_DIR).collect()
    }
    assert len(pq) == 50
    recall = len(exact & pq) / len(exact)
    assert recall >= 0.1, f"PQ recall collapsed: {recall:.2f}"
