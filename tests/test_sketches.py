"""Property tests for the scale techniques that are NOT fully covered
by the oracle hash (which only sees the final answer): the Count-Min
sketch's no-false-negative guarantee and discrimination, the Z-order
bucket locality envelope, and the weighted sample's row-level rule."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from flink_streaming_example_spark.operators.layout import _BITS
from flink_streaming_example_spark.operators.sketches import _HH_K, cms_estimates
from flink_streaming_example_spark.plans.registry import all_specs
from flink_streaming_example_spark.sources.tables import load_table

_SPECS = all_specs()


def test_cms_never_underestimates(spark, sf_dir):
    """The CMS correctness contract: every token's sketch estimate is
    >= its true count (collisions only ADD).  This is what lets
    q_heavy_hitters filter on the estimate without losing a true heavy
    hitter — verified here against exhaustive counts."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    )
    exact = tokens.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    joined = cms_estimates(tokens).join(exact, "word").toPandas()
    assert len(joined) > 0
    under = joined[joined.est < joined.n]
    assert under.empty, f"CMS underestimated: {under.to_dict('records')}"


def test_cms_filter_discriminates(spark, sf_dir):
    """The sketch must actually prune: the candidate set passed to the
    exact-verify pass is a strict subset of the vocabulary (else the
    'scale-safe' plan silently degenerates into the exhaustive GROUP BY
    it exists to avoid), and the final output equals the true heavy
    hitters (parity covers values; this covers the mechanism)."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    )
    total = tokens.count()
    vocab = tokens.distinct().count()
    est = cms_estimates(tokens)
    n_candidates = est.where(F.col("est") * _HH_K >= F.lit(total)).count()
    n_heavy = _SPECS["q_heavy_hitters"].fn(spark, sf_dir).count()
    assert n_heavy <= n_candidates <= vocab
    assert n_candidates < vocab, (
        f"sketch filter passed all {vocab} words — no discrimination"
    )


def test_zorder_buckets_confine_both_dimensions(spark, sf_dir):
    """The clustering property Z-order exists for: every bucket
    (a fixed 4-bit Z prefix) confines BOTH dimensions to a 2^(B-2)
    range — so parquet min/max stats prune scans on either predicate.
    A single-column sort gives this for one dimension only."""
    pdf = _SPECS["q_zorder_layout"].fn(spark, sf_dir).toPandas()
    # 4 high bits -> up to 16 quadrants; sf0.01's suppkey domain only
    # reaches y=99, so the y >= 128 half is empty there (8 buckets)
    assert 8 <= len(pdf) <= 16
    span = 1 << (_BITS - 2)  # 2 high bits per dimension -> 64-wide cell
    for _, row in pdf.iterrows():
        assert row.x_max - row.x_min < span, row.to_dict()
        assert row.y_max - row.y_min < span, row.to_dict()
        # each bucket's envelope starts on a cell boundary
        assert row.x_min // span == row.x_max // span
        assert row.y_min // span == row.y_max // span


def test_weighted_sample_matches_rowwise_rule(spark, sf_dir):
    """The sample is a pure row function: recompute the md5 coin in
    plain Python (independent of both engines) and assert the selected
    doc_id set matches exactly — reproducibility is the whole point of
    hash-based sampling."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    ).toPandas()
    want = {
        int(r.doc_id)
        for r in docs.itertuples()
        if int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) % 600
        < min(int(r.n_chars), 600)
    }
    got = {
        int(r.doc_id)
        for r in _SPECS["q_weighted_sample"]
        .fn(spark, sf_dir)
        .select("doc_id")
        .toPandas()
        .itertuples()
    }
    assert got == want
    assert 0 < len(got) < len(docs)  # neither empty nor degenerate


def test_zvalue_matches_reference_interleave(spark):
    """The Morton expression must equal a pure-Python bit interleave on
    the full corner set + a deterministic sample — an off-by-one in a
    shift term would still produce 'locality-ish' buckets that pass
    the envelope test, so pin the exact encoding."""
    import pandas as pd

    from pyspark.sql import functions as F

    from flink_streaming_example_spark.operators.layout import _zvalue

    def ref(x: int, y: int) -> int:
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [(x, y) for x in (0, 1, 127, 128, 255) for y in (0, 1, 127, 128, 255)]
    pts += [((37 * k) % 256, (91 * k) % 256) for k in range(64)]
    pdf = pd.DataFrame(pts, columns=["x", "y"])
    got = (
        spark.createDataFrame(pdf)
        .select("x", "y", _zvalue(F.col("x"), F.col("y")).alias("z"))
        .toPandas()
    )
    for _, r in got.iterrows():
        assert r.z == ref(int(r.x), int(r.y)), (r.x, r.y, r.z)
