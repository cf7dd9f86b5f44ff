"""Count-Min-sketch heavy hitters — the two-pass frequent-items
pattern for 100 TB corpora (SURVEY.md §2.9 mandate, beyond the
reference surface, next to the HLL / GK sketches in aggregations.py).

At scale you never `GROUP BY token` over the full corpus to find the
frequent ones: the token stream is orders of magnitude larger than its
vocabulary, and the vocabulary itself can exceed executor memory.  The
standard answer (Cormode & Muthukrishnan's Count-Min sketch) is a
d x w counter grid updated at d hash positions per token.  Mapped to
Spark's execution model each property falls out of an aggregation
shape:

- pass 1 (sketch build): explode each token into its d (depth, bucket)
  cells and `GROUP BY depth, bucket` — the shuffle cardinality is the
  SKETCH size (d*w cells, constant), not the vocabulary.  Partial
  aggregation does the map-side combine, which is exactly the
  "mergeable sketch" property of CMS.
- pass 2 (candidate probe): each distinct token's estimate is the MIN
  over its d cells, taken via a broadcast join against the tiny sketch
  — no second full shuffle beyond the vocabulary-sized distinct.
- pass 3 (exact verify): CMS only OVER-estimates (no false negatives),
  so exact-counting just the candidate set — a broadcast semi-join
  then a candidates-only GROUP BY — yields exactly the true heavy
  hitters.  The only full-cardinality aggregation in the whole plan is
  over the (tiny) candidate vocabulary.

Because the verify pass removes CMS false positives and the guarantee
removes false negatives, the output is bit-equal to the exact
`HAVING count*K >= total` answer — which is the DuckDB oracle, making
a probabilistic data structure fully hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_CMS_DEPTH = 4
_CMS_WIDTH = 256
# phi = 1/_HH_K of all tokens makes a word a heavy hitter.  The
# synthetic corpus has a 31-word vocabulary with a shallow frequency
# gradient; 1/30 lands the threshold mid-gradient so the sketch filter
# actually discriminates (~12 of 31 words pass at sf0.01).
_HH_K = 30


def _bucket(col, depth: int):
    """Row-hash for CMS row `depth`: first 8 md5 hex digits of the
    salted token, mod width — the same engine-portable integer-hash
    idiom as sampling.q_sample_hash (md5 is bit-identical in Spark
    and DuckDB, so the sketch geometry is reproducible anywhere)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{depth}:"), col)), 1, 8), 16, 10
        ).cast("long")
        % _CMS_WIDTH
    )


_HEAVY_ORACLE = f"""
WITH words AS (
  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
), tot AS (
  SELECT COUNT(*) AS n FROM words
)
SELECT word, CAST(COUNT(*) AS BIGINT) AS n_occ
FROM words
GROUP BY word
HAVING COUNT(*) * {_HH_K} >= (SELECT n FROM tot)
"""


def _cells(tokens: DataFrame) -> DataFrame:
    """Each token exploded into its d (depth, bucket) sketch cells."""
    return tokens.select(
        F.posexplode(
            F.array(
                *[_bucket(F.col("word"), d) for d in range(_CMS_DEPTH)]
            )
        ).alias("depth", "bucket")
    )


def cms_sketch(tokens: DataFrame) -> DataFrame:
    """Pass 1: the d*w-cell sketch (depth, bucket, cell) — shuffle
    cardinality is the sketch size, not the vocabulary."""
    return _cells(tokens).groupBy("depth", "bucket").agg(
        F.count(F.lit(1)).alias("cell")
    )


def cms_estimates(tokens: DataFrame, sketch: DataFrame | None = None) -> DataFrame:
    """(word, est) for every distinct token of `tokens[word]`: est is
    the Count-Min estimate — MIN over the token's d sketch cells,
    probed via a broadcast join against the d*w-cell sketch (built
    from the same tokens unless a prebuilt one — e.g. the streaming
    engine's drained sketch — is passed in).  The CMS guarantee
    (est >= true count, always) is what makes the heavy-hitter filter
    free of false negatives; pinned in tests/test_sketches.py."""
    if sketch is None:
        sketch = cms_sketch(tokens)
    probes = tokens.distinct().select(
        "word",
        F.posexplode(
            F.array(
                *[_bucket(F.col("word"), d) for d in range(_CMS_DEPTH)]
            )
        ).alias("depth", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy("word")
        .agg(F.min("cell").alias("est"))
    )


def heavy_hitters(tokens: DataFrame, sketch: DataFrame | None = None) -> DataFrame:
    """Passes 2+3 of the frequent-items plan over a token stream and a
    (possibly prebuilt) sketch: broadcast candidate probe, then exact
    counts over the candidate set only — shared verbatim by the batch
    and streaming heavy-hitter keys so the two cannot drift."""
    total = tokens.agg(F.count(F.lit(1)).alias("total"))
    # sketch estimates never under-count, so this filter keeps every
    # true heavy hitter (plus possibly a few collision-inflated words)
    candidates = cms_estimates(tokens, sketch).join(
        F.broadcast(total), how="cross"
    ).where(F.col("est") * _HH_K >= F.col("total"))
    # pass 3: exact counts for candidates only -> drops false positives
    exact = (
        tokens.join(
            F.broadcast(candidates.select("word")), "word", "left_semi"
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    return exact.join(F.broadcast(total), how="cross").where(
        F.col("n_occ") * _HH_K >= F.col("total")
    ).select("word", "n_occ")


def doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch token stream both heavy-hitter keys count."""
    return load_table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    )


@register("q_heavy_hitters", oracle=_HEAVY_ORACLE, tags=("sketch", "llm"))
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent tokens (count >= total/30) via Count-Min sketch +
    exact verification — the scale-safe frequent-items plan (module
    docstring): sketch build shuffles d*w=1024 cells, candidate probe
    is a broadcast join, and the only per-token aggregation runs over
    the sketch-filtered candidate set.  Exactly equals the oracle's
    exhaustive GROUP BY because CMS has no false negatives and the
    verify pass drops its false positives.

    The token frame is PINNED (round-14, VERDICT r13 item 7): the
    sketch-build, candidate-extraction, exact-verify and totals legs
    previously each re-ran the explode subtree — five documents scans
    folded into one (tests/scan_baseline.json `pin:documents`).  The
    streaming twin keeps its own per-batch token frame; the shared
    heavy_hitters() kernel is untouched."""
    from flink_streaming_example_spark.operators import pinning

    return heavy_hitters(
        pinning.pin(doc_tokens(spark, sf_dir), "q_heavy_hitters:tokens")
    )


_BASKET_ORACLE = """
WITH baskets AS (
  SELECT DISTINCT user_id,
         date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         event_type
  FROM events
), nb AS (
  SELECT COUNT(*) AS n_baskets
  FROM (SELECT DISTINCT user_id, day FROM baskets)
), c1 AS (
  SELECT event_type, COUNT(*) AS c FROM baskets GROUP BY event_type
), p AS (
  SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS c12
  FROM baskets a JOIN baskets b
    ON a.user_id = b.user_id AND a.day = b.day
   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.t1, p.t2,
  CAST(p.c12 AS BIGINT) AS c12,
  CAST(nb.n_baskets * p.c12 AS BIGINT) AS lift_num,
  CAST(x.c * y.c AS BIGINT) AS lift_den
FROM p
CROSS JOIN nb
JOIN c1 x ON p.t1 = x.event_type
JOIN c1 y ON p.t2 = y.event_type
"""


@register("q_basket_lift", oracle=_BASKET_ORACLE, tags=("sketch", "mining"))
def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining, the frequent-itemset pass: per
    (user, day) basket of distinct event types, pairwise co-occurrence
    support and LIFT — the Apriori/market-basket primitive next to the
    CMS heavy-hitters key (single-item frequency -> item-PAIR
    frequency).  Lift(t1,t2) = N*c12 / (c1*c2) is emitted as exact
    integer components (lift_num, lift_den), so no engine divides.

    Scale shape: baskets are one distinct-shuffle keyed by
    (user, day, type); pair expansion is IN-ROW over each basket's
    sorted type array (bounded by basket cardinality — the vocabulary,
    not the corpus), pair counts shuffle on the compact pair key, and
    the singleton-count and grand-total sides are vocabulary-sized
    broadcasts.  The q_kcore co-occurrence lesson applied to itemsets:
    never self-join the event log when an in-row expansion is
    available.  The basket frame is PINNED (round-14, the bm25
    recipe): its distinct-shuffle subtree previously re-executed for
    the pair-count, both singleton roles, and the grand total — four
    events scans now folded into one (tests/scan_baseline.json
    `pin:events`)."""
    from flink_streaming_example_spark.operators import pinning

    ev = load_table(spark, sf_dir, "events")
    baskets = pinning.pin(
        ev.groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).alias("day")
        ).agg(F.array_sort(F.collect_set("event_type")).alias("types")),
        "q_basket_lift:baskets",
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("types"),
            lambda x, i: F.transform(
                F.slice(F.col("types"), i + F.lit(2), F.size(F.col("types"))),
                lambda y: F.struct(x.alias("t1"), y.alias("t2")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .select("p.t1", "p.t2")
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    c1 = (
        baskets.select(F.explode("types").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nb = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    return (
        pairs.crossJoin(F.broadcast(nb))
        .join(
            F.broadcast(c1.select(F.col("event_type").alias("t1"),
                                  F.col("c").alias("c1v"))),
            "t1",
        )
        .join(
            F.broadcast(c1.select(F.col("event_type").alias("t2"),
                                  F.col("c").alias("c2v"))),
            "t2",
        )
        .select(
            "t1",
            "t2",
            "c12",
            (F.col("n_baskets") * F.col("c12")).alias("lift_num"),
            (F.col("c1v") * F.col("c2v")).alias("lift_den"),
        )
    )
