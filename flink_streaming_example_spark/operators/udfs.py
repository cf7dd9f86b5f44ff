"""User-defined function surface (SURVEY.md §2.10): the Spark
equivalents of Flink's three extension points, each proven against the
DuckDB oracle so the *mechanism* — Arrow batch transfer, grouped-agg
merge, table-function lateral join — is verified, not just the math.

  Flink MapFunction        -> q_udf_scalar   (vectorized pandas UDF)
  Flink AggregateFunction  -> q_udaf_grouped (GROUPED_AGG pandas UDF)
  Flink TableFunction      -> q_udtf_tokens  (Python UDTF, 1→N lateral)

Policy reminder (§2.10): builtin expressions ALWAYS win in the hot
path — every function here is deliberately also SQL-expressible so the
Python path itself is hash-checkable.  These keys exist because a user
porting Flink jobs will bring custom Java/Python logic that has no
builtin twin; this is the surface they port it onto.

Determinism notes: the scalar UDF mirrors the engine-wide
floor-half-up rounding before emitting doubles; the UDAF reduces
integers (order-independent); the UDTF emits per-doc token counts in
sorted token order (output order is irrelevant to the order-insensitive
hash, but sorting keeps reruns byte-identical).

Scale notes (100 TB): all three run as Arrow-batched (UDF/UDAF) or
row-stream (UDTF) Python workers per partition — embarrassingly
parallel, no extra shuffle beyond the declared groupBy/lateral.  The
UDAF's partial aggregation happens Python-side per partition group;
for very hot keys pre-aggregate with builtins first (the salted
pattern in functions/skew.py).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_UDF_SCALAR_ORACLE = """
SELECT
  doc_id,
  lang,
  CAST(FLOOR(
    (CAST(len(string_split(text, ' ')) AS DOUBLE) / (1.0 + length(text)))
    * 1000000.0 + 0.5
  ) AS DOUBLE) / 1000000.0 AS density
FROM documents
"""


@register("q_udf_scalar", oracle=_UDF_SCALAR_ORACLE, tags=("udf", "python"))
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 MapFunction equivalent: a vectorized (Arrow series-to-
    series) pandas UDF computing token density = #tokens / (1+chars).
    One Arrow batch per partition chunk, no per-row Python overhead."""
    import numpy as np

    @F.pandas_udf("double")
    def token_density(text: pd.Series) -> pd.Series:
        toks = text.str.split(" ").str.len().astype("float64")
        raw = toks / (1.0 + text.str.len().astype("float64"))
        return np.floor(raw * 1000000.0 + 0.5) / 1000000.0

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", token_density(F.col("text")).alias("density")
    )


_UDAF_ORACLE = """
SELECT
  lang,
  COUNT(*) AS n_docs,
  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY lang
"""


@register("q_udaf_grouped", oracle=_UDAF_ORACLE, tags=("udf", "python"))
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 AggregateFunction equivalent: a GROUPED_AGG pandas UDF
    (series -> scalar per group) summing per-doc token counts.  The
    reduction is over integers, so partition merge order cannot move
    the result — the UDAF mechanism is hash-checkable."""

    @F.pandas_udf("long")
    def sum_tokens(n: pd.Series) -> int:
        return int(n.sum())

    @F.pandas_udf("long")
    def count_rows(n: pd.Series) -> int:
        return int(len(n))

    docs = load_table(spark, sf_dir, "documents")
    with_counts = docs.select(
        "lang", F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )
    # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM
    # aggregates in one agg(), so the count is a pandas UDAF too.
    return with_counts.groupBy("lang").agg(
        count_rows(F.col("n_tok")).alias("n_docs"),
        sum_tokens(F.col("n_tok")).alias("total_tokens"),
    )


_UDTF_ORACLE = """
SELECT doc_id, token, COUNT(*) AS n
FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
GROUP BY doc_id, token
"""


@register("q_udtf_tokens", oracle=_UDTF_ORACLE, tags=("udf", "python"))
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 TableFunction equivalent: a Python UDTF (Spark 4) emitting
    one row per distinct token per document with its in-doc count —
    the 1→N lateral-join shape of Flink's collector.collect() loop,
    driven through SQL `LATERAL` exactly as a user would."""
    from pyspark.sql.functions import udtf

    # Arrow-optimized: rows cross to Python as Arrow batches, keeping
    # the 1→N path off row-at-a-time pickling (and visible in the plan
    # as an Arrow stage, which the plan gate enforces).
    @udtf(returnType="doc_id bigint, token string, n bigint", useArrow=True)
    class TokenCounts:
        def eval(self, doc_id: int, text: str):
            from collections import Counter

            for tok, cnt in sorted(Counter(text.split(" ")).items()):
                yield doc_id, tok, cnt

    spark.udtf.register("token_counts", TokenCounts)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "udtf_documents"
    )
    return spark.sql(
        """
        SELECT t.doc_id, t.token, t.n
        FROM udtf_documents, LATERAL token_counts(doc_id, text) t
        """
    )


_COGROUP_ORACLE = """
WITH e AS (
  SELECT user_id, COUNT(*) AS n_events,
    COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks
  FROM events GROUP BY user_id
), o AS (
  SELECT o_custkey AS user_id, COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT COALESCE(e.user_id, o.user_id) AS user_id,
  CAST(COALESCE(e.n_events, 0) AS BIGINT) AS n_events,
  CAST(COALESCE(e.n_clicks, 0) AS BIGINT) AS n_clicks,
  CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders
FROM e FULL JOIN o ON e.user_id = o.user_id
"""


_GROUPED_MAP_ORACLE = """
WITH flagged AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
          OR CAST(ts AS TIMESTAMP)
             - lag(CAST(ts AS TIMESTAMP)) OVER w > INTERVAL 1 HOUR
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
)
SELECT event_id, user_id,
  CAST(SUM(new_s) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS session_seq
FROM flagged
"""


@register("q_grouped_map_udf", oracle=_GROUPED_MAP_ORACLE, tags=("udf", "python"))
def q_grouped_map_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 ProcessFunction-port equivalent: grouped-map
    applyInPandas — arbitrary per-key Python over each key's full row
    set, the shape a Flink keyed ProcessFunction lands on in batch.
    The function sessionizes (1h gap) and numbers each user's
    sessions, all in vectorized pandas; the oracle is the
    gaps-and-islands SQL, so the Python path is hash-checked against
    declarative semantics.  Bucketed by user_id mod 256 exactly like
    q_cogroup_udf (comment below): 256 interpreter calls, per-user
    boundaries handled by the vectorized group-change test.  Outputs
    are integer ordinals over a deterministic (ts, event_id) total
    order — nothing float, nothing arrival-order-dependent."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        (F.col("user_id") % _COGROUP_BUCKETS).alias("bucket"),
    )

    def sessionize(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "t_us", "event_id"])
        new_user = pdf.user_id.ne(pdf.user_id.shift())
        gap = pdf.t_us - pdf.t_us.shift()
        new_session = (new_user | (gap > 3_600_000_000)).astype("int64")
        return pd.DataFrame(
            {
                "event_id": pdf.event_id.astype("int64"),
                "user_id": pdf.user_id.astype("int64"),
                "session_seq": new_session.groupby(
                    pdf.user_id.values
                ).cumsum(),
            }
        )

    return ev.groupBy("bucket").applyInPandas(
        sessionize, "event_id long, user_id long, session_seq long"
    )


# Bucketed cogroup: Python is invoked ONCE PER GROUP, so cogrouping
# directly on the 15k-user key pays 15k interpreter round-trips of
# fixed overhead (~1 ms each — measured 15.0 s at sf0.1, the worst
# key in the bench).  Keying the cogroup by a BUCKET of the join key
# instead (user_id mod 256) amortizes that to 256 calls, and the
# per-user work inside each call is a vectorized pandas groupby —
# 15.0 s -> sub-second, identical semantics (every user's rows still
# meet in exactly one call).  This is the general recipe whenever a
# keyed Python operator meets a high-cardinality key and the per-key
# logic is batchable; a key whose logic needs true per-key isolation
# (timers, per-key state) stays 1:1 like the streaming keys.
_COGROUP_BUCKETS = 256


@register("q_cogroup_udf", oracle=_COGROUP_ORACLE, tags=("udf", "python"))
def q_cogroup_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 CoGroupFunction equivalent: Flink's
    connect/keyBy/coGroup — both relations shuffled on the same key
    once, then ONE Python function sees a key's rows from BOTH sides
    together (`groupBy().cogroup().applyInPandas`, Arrow batches per
    side), bucketed per the comment above so per-group interpreter
    overhead amortizes.  Keys present on either side appear (outer
    cogroup semantics), so the oracle is the FULL JOIN of the two
    per-key aggregates.  Outputs are integer counts only — nothing
    in the Python function depends on within-group row order, which
    is partition-dependent and must never reach a result."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("event_type") == "click").cast("int").alias("is_click"),
        (F.col("user_id") % _COGROUP_BUCKETS).alias("bucket"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        (F.col("o_custkey") % _COGROUP_BUCKETS).alias("bucket"),
    )

    def merge(key: tuple, epdf: pd.DataFrame, opdf: pd.DataFrame) -> pd.DataFrame:
        # empty placeholders carry an explicitly NAMED index and typed
        # columns so the outer join never depends on pandas propagating
        # the index name from the non-empty side, and fillna stays on
        # int64 (no object-dtype downcast FutureWarning) — advisor
        # robustness note, round 7.
        empty_ix = pd.Index([], name="user_id", dtype="int64")
        e = (
            epdf.groupby("user_id")["is_click"]
            .agg(n_events="size", n_clicks="sum")
            if len(epdf)
            else pd.DataFrame(
                {"n_events": pd.Series([], dtype="int64"),
                 "n_clicks": pd.Series([], dtype="int64")},
                index=empty_ix,
            )
        )
        o = (
            opdf.groupby("user_id").size().rename("n_orders").to_frame()
            if len(opdf)
            else pd.DataFrame(
                {"n_orders": pd.Series([], dtype="int64")}, index=empty_ix
            )
        )
        merged = e.join(o, how="outer")
        for c in ("n_events", "n_clicks", "n_orders"):
            merged[c] = merged[c].fillna(0)
        merged = merged.reset_index()
        return pd.DataFrame(
            {
                "user_id": merged["user_id"].astype("int64"),
                "n_events": merged["n_events"].astype("int64"),
                "n_clicks": merged["n_clicks"].astype("int64"),
                "n_orders": merged["n_orders"].astype("int64"),
            }
        )

    return (
        ev.groupBy("bucket")
        .cogroup(orders.groupBy("bucket"))
        .applyInPandas(
            merge,
            "user_id long, n_events long, n_clicks long, n_orders long",
        )
    )


# ---- async external enrichment (round 8): Flink's AsyncDataStream /
# AsyncFunction pattern — enrich a stream against an external service
# without blocking per record.  Spark-first translation: the unit of
# concurrency is the ARROW BATCH, not the record — mapInPandas
# deduplicates the batch's keys (the async-cache trick), issues ONE
# vectorized "request" per unique key, and maps results back onto
# the rows order-preservingly.  The "service" here is a deterministic
# pure function of the key (md5-derived score) so the DuckDB oracle
# can recompute every response; a real deployment swaps _service for
# an aiohttp/grpc batch call with identical batching shape.  At
# 100 TB: requests per partition = unique keys per batch, never rows,
# and the narrow map rides the scan — no shuffle until the report.
_ASYNC_ORACLE = """
WITH svc AS (
  SELECT user_id, event_id,
    CAST(CONCAT('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
         AS BIGINT) % 1000 AS score
  FROM events
)
SELECT
  CASE WHEN score >= 900 THEN 'gold'
       WHEN score >= 500 THEN 'silver'
       ELSE 'bronze' END AS tier,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  CAST(SUM(score) AS BIGINT) AS total_score
FROM svc
GROUP BY tier
"""


def _service(user_ids):
    """The deterministic stand-in external service: md5-derived score
    per key (portable first-8-hex rule, same as the sampling family)."""
    import hashlib

    return {
        u: int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 1000
        for u in user_ids
    }


@register("q_async_enrich", oracle=_ASYNC_ORACLE, tags=("udf", "python"))
def q_async_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 AsyncFunction equivalent (block comment above): per
    Arrow batch, dedupe keys -> one batched service call -> map back.
    The per-tier report makes the whole enrichment hash-checkable."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")

    def kernel(batches):
        for pdf in batches:
            responses = _service(pdf["user_id"].unique())
            score = pdf["user_id"].map(responses)
            yield pd.DataFrame(
                {
                    "user_id": pdf["user_id"],
                    "score": score.astype("int64"),
                }
            )

    enriched = ev.mapInPandas(kernel, schema="user_id long, score long")
    tier = (
        F.when(F.col("score") >= 900, "gold")
        .when(F.col("score") >= 500, "silver")
        .otherwise("bronze")
    )
    return (
        enriched.select(tier.alias("tier"), "user_id", "score")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum("score").cast("long").alias("total_score"),
        )
    )
