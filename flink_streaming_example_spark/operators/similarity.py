"""Similarity search over embeddings (SURVEY.md §2.9 L3, L6).

Cosine similarity is computed entirely with array expressions
(`transform`/`zip_with`/`aggregate` — SURVEY §2.7): the fold stays in
whole-stage codegen, no Python, no UDF.  Norms are precomputed per side
BEFORE the join so the pair computation is one dot product, not three.

Determinism: ranking and output use cosine half-up-rounded at 1e-4 with
a vec_id tiebreaker — engines may differ in the last ulp of a 64-term
float fold, and the rounding plus total order make top-k cuts stable.

Scale notes (100 TB): the committed exact path broadcasts the QUERY
side (queries are few; the corpus streams by partition — brute-force
cosine is one scan, embarrassingly parallel: this is the right baseline
even at scale).  The scale path for corpus×corpus or huge query sets is
IVF/LSH bucketing: BucketedRandomProjectionLSH (random hyperplanes) or
k-means coarse quantizer to bucket vectors, then the same expression
within buckets.  q_knn_ivf implements that shape with a deterministic
coarse quantizer (seeded centroids) so the bucketed plan is exercised
and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table


def _dot(a: str | Column, b: str | Column) -> Column:
    """Sequential left-fold dot product in double (JVM expression)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _as_double(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _round4(c: Column) -> Column:
    return F.floor(c * F.lit(10000.0) + F.lit(0.5)).cast("double") / F.lit(10000.0)


_KNN_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
), scored AS (
  SELECT
    q.vec_id AS query_id,
    c.vec_id AS neighbor_id,
    CAST(FLOOR(
      (list_dot_product(q.v, c.v) / (q.nrm * c.nrm)) * 10000.0 + 0.5
    ) AS DOUBLE) / 10000.0 AS cos_sim
  FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
  ) AS rn
  FROM scored
)
WHERE rn <= 5
"""


@register("q_knn_cosine", oracle=_KNN_ORACLE, tags=("similarity",))
def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: exact top-5 cosine neighbors for each of 10 query vectors —
    brute-force baseline: broadcast the tiny query side, stream the
    corpus, one partial top-k per partition after the window filter."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", _as_double("embedding").alias("v")).withColumn(
        "nrm", F.sqrt(_dot("v", "v"))
    )
    q = (
        e.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _round4(_dot("qv", "v") / (F.col("qn") * F.col("nrm"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.select(
        "query_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 5)


_IVF_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), seeds AS (
  SELECT vec_id AS seed_id, v AS sv FROM e WHERE vec_id < 8
), assigned AS (
  SELECT vec_id, seed_id AS bucket FROM (
    SELECT e.vec_id, s.seed_id,
      ROW_NUMBER() OVER (
        PARTITION BY e.vec_id
        ORDER BY
          CAST(FLOOR(
            (list_dot_product(e.v, e.v)
             - 2 * list_dot_product(e.v, s.sv)
             + list_dot_product(s.sv, s.sv)) * 1000000.0 + 0.5
          ) AS DOUBLE) / 1000000.0,
          s.seed_id
      ) AS rn
    FROM e, seeds s
  ) WHERE rn = 1
), n AS (
  SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm, a.bucket
  FROM e JOIN assigned a ON e.vec_id = a.vec_id
), scored AS (
  SELECT
    q.vec_id AS query_id,
    c.vec_id AS neighbor_id,
    CAST(FLOOR(
      (list_dot_product(q.v, c.v) / (q.nrm * c.nrm)) * 10000.0 + 0.5
    ) AS DOUBLE) / 10000.0 AS cos_sim
  FROM n q JOIN n c ON q.bucket = c.bucket
   AND q.vec_id < 10 AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
  ) AS rn
  FROM scored
)
WHERE rn <= 5
"""


@register("q_knn_ivf", oracle=_IVF_ORACLE, tags=("similarity", "approx"))
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3b: bucketed (IVF-shaped) approximate top-k — candidates are
    restricted to the query's bucket, so the pair join is an equi-join
    on bucket id: THE structural difference that makes ANN scale (the
    shuffle key is the bucket, pair count drops by ~#buckets).

    Bucket assignment is a real coarse quantizer: nearest of 8 fixed
    seed vectors by L2 (IVF with seeded centroids — deterministic, so
    the oracle is exact; swapping in k-means-trained centroids changes
    only the seed table).  Distances ranked on the 1e-6-rounded value
    with a seed-id tiebreaker, keeping the argmin cut cross-engine
    stable."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", _as_double("embedding").alias("v"))
    seeds = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("seed_id"), F.col("v").alias("sv")
    )
    d2 = (
        _dot("v", "v")
        - F.lit(2.0) * _dot("v", "sv")
        + _dot("sv", "sv")
    )
    d2r = F.floor(d2 * F.lit(1000000.0) + F.lit(0.5)).cast("double") / F.lit(
        1000000.0
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("d2r"), F.col("seed_id"))
    assigned = (
        base.crossJoin(F.broadcast(seeds))
        .select("vec_id", "v", "seed_id", d2r.alias("d2r"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", F.col("seed_id").alias("bucket"))
    )
    e = assigned.withColumn("nrm", F.sqrt(_dot("v", "v")))
    q = (
        e.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.col("bucket").alias("qbucket"),
        )
    )
    scored = (
        F.broadcast(q)
        .join(
            e,
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _round4(_dot("qv", "v") / (F.col("qn") * F.col("nrm"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.select(
        "query_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 5)


_KMEANS_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), seeds AS (
  SELECT vec_id AS seed_id, v AS sv FROM e WHERE vec_id < 8
), a0 AS (
  SELECT vec_id, seed_id AS bucket FROM (
    SELECT e.vec_id, s.seed_id,
      ROW_NUMBER() OVER (
        PARTITION BY e.vec_id
        ORDER BY
          CAST(FLOOR(
            (list_dot_product(e.v, e.v)
             - 2 * list_dot_product(e.v, s.sv)
             + list_dot_product(s.sv, s.sv)) * 1000000.0 + 0.5
          ) AS DOUBLE) / 1000000.0,
          s.seed_id
      ) AS rn
    FROM e, seeds s
  ) WHERE rn = 1
), ex AS (
  SELECT a0.bucket, e.vec_id, i AS pos, CAST(e.v[i] AS DOUBLE) AS x
  FROM e JOIN a0 USING (vec_id), (SELECT unnest(range(1, 65)) AS i)
), c1 AS (
  SELECT bucket, pos,
    CAST(SUM(CAST(x AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS c
  FROM ex GROUP BY bucket, pos
), c1v AS (
  SELECT bucket, list(c ORDER BY pos) AS cv FROM c1 GROUP BY bucket
), a1 AS (
  SELECT vec_id, b AS bucket FROM (
    SELECT e.vec_id, c.bucket AS b,
      ROW_NUMBER() OVER (
        PARTITION BY e.vec_id
        ORDER BY
          CAST(FLOOR(
            (list_dot_product(e.v, e.v)
             - 2 * list_dot_product(e.v, c.cv)
             + list_dot_product(c.cv, c.cv)) * 1000000.0 + 0.5
          ) AS DOUBLE) / 1000000.0,
          c.bucket
      ) AS rn
    FROM e, c1v c
  ) WHERE rn = 1
), n AS (
  SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm, a1.bucket
  FROM e JOIN a1 USING (vec_id)
), scored AS (
  SELECT
    q.vec_id AS query_id,
    c.vec_id AS neighbor_id,
    CAST(FLOOR(
      (list_dot_product(q.v, c.v) / (q.nrm * c.nrm)) * 10000.0 + 0.5
    ) AS DOUBLE) / 10000.0 AS cos_sim
  FROM n q JOIN n c ON q.bucket = c.bucket
   AND q.vec_id < 10 AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
  ) AS rn
  FROM scored
)
WHERE rn <= 5
"""


def _argmin_bucket(base: DataFrame, cents: DataFrame) -> DataFrame:
    """Assign each vector to its nearest centroid by L2² (1e-6-rounded,
    centroid-id tiebreaker): one broadcast crossJoin + windowed argmin —
    the coarse-quantizer assignment step shared by seeded and trained
    centroids.  cents: (bucket, cv)."""
    d2 = (
        _dot("v", "v")
        - F.lit(2.0) * _dot("v", "cv")
        + _dot("cv", "cv")
    )
    d2r = F.floor(d2 * F.lit(1000000.0) + F.lit(0.5)).cast("double") / F.lit(
        1000000.0
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("d2r"), F.col("bucket"))
    return (
        base.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", "bucket", d2r.alias("d2r"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "bucket")
    )


@register("q_knn_kmeans", oracle=_KMEANS_ORACLE, tags=("similarity", "approx"))
def q_knn_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3c: IVF with k-means-TRAINED centroids — one Lloyd step from
    the 8 seed vectors (assign -> per-dimension mean -> re-assign),
    then the same bucketed top-k as q_knn_ivf.  This completes the
    'swap in trained centroids' path q_knn_ivf documents: the
    assignment operator (_argmin_bucket) is literally shared.

    Determinism (so even the trained path is oracle-checkable): the
    Lloyd mean is an exact decimal sum divided by the count (merge-order
    independent, bit-identical in DuckDB), assignments rank the
    1e-6-rounded L2² with a centroid-id tiebreaker.

    Scale shape (100 TB): training touches each vector twice (two
    broadcast-assignment scans, no pair shuffle); the per-dimension
    mean shuffles #buckets x 64 rows — constant in corpus size.  More
    Lloyd rounds repeat the same two operators."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", _as_double("embedding").alias("v"))
    seeds = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("bucket"), F.col("v").alias("cv")
    )
    a0 = _argmin_bucket(base, seeds)
    # Lloyd step: new centroid = per-dimension decimal-exact mean
    ex = a0.select("bucket", F.posexplode("v").alias("pos", "x"))
    c1 = ex.groupBy("bucket", "pos").agg(
        (
            F.sum(F.col("x").cast("decimal(30,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    c1v = c1.groupBy("bucket").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s["c"],
        ).alias("cv")
    )
    e = _argmin_bucket(base, c1v).withColumn("nrm", F.sqrt(_dot("v", "v")))
    q = (
        e.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.col("bucket").alias("qbucket"),
        )
    )
    scored = (
        F.broadcast(q)
        .join(
            e,
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _round4(_dot("qv", "v") / (F.col("qn") * F.col("nrm"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.select(
        "query_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 5)


# ---------------------------------------------------------------- PQ
# Product quantization (Jégou et al., "Product Quantization for
# Nearest Neighbor Search", PAMI 2011): split the 64-dim space into
# M=4 16-dim subspaces, quantize each subvector against a per-subspace
# codebook of K=8 codes, and answer queries with the asymmetric
# distance (ADC): the RAW query subvector's distance to each corpus
# vector's CODE centroid, summed over subspaces.  The corpus side of
# the query join carries only (vec_id, m, code) — 4 small ints per
# vector instead of 64 floats, which is the entire point at 100 TB:
# the scan that scores the corpus reads the code table (a ~100x
# compression), and the 10-query x 4-subspace x 8-code distance table
# (320 rows) rides along as a broadcast.
#
# Determinism (oracle-checkable like the other quantizers): codebooks
# are the subvectors of the 8 seed vectors (vec_id < 8, same seeding
# rule as q_knn_kmeans — a Lloyd refinement would reuse that key's
# per-dimension decimal-mean step per subspace); code assignment ranks
# the 1e-6-rounded subspace L2^2 with a code-id tiebreaker; the ADC
# sum runs in DECIMAL(18,6) (each rounded subdistance casts exactly,
# and a decimal sum is merge-order-free in both engines).

_PQ_M = 4  # subspaces
_PQ_SUBDIM = 16  # dims per subspace
_PQ_K = 8  # codes per subspace

_PQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), sub AS (
  SELECT vec_id, m.m,
         v[m.m * {_PQ_SUBDIM} + 1 : (m.m + 1) * {_PQ_SUBDIM}] AS vs
  FROM e, (SELECT unnest(range({_PQ_M})) AS m) m
), cb AS (
  SELECT m, vec_id AS code, vs AS cbv FROM sub WHERE vec_id < {_PQ_K}
), dist AS (
  SELECT s.vec_id, s.m, c.code,
    CAST(FLOOR(
      (list_dot_product(s.vs, s.vs)
       - 2 * list_dot_product(s.vs, c.cbv)
       + list_dot_product(c.cbv, c.cbv)) * 1000000.0 + 0.5
    ) AS DOUBLE) / 1000000.0 AS d2r
  FROM sub s JOIN cb c USING (m)
), codes AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2r, code) AS rn
    FROM dist
  ) WHERE rn = 1
), qd AS (
  SELECT vec_id AS query_id, m, code, d2r FROM dist WHERE vec_id < 10
), adc AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    CAST(SUM(CAST(q.d2r AS DECIMAL(18,6))) AS DOUBLE) AS adc_d2
  FROM codes c JOIN qd q USING (m, code)
  WHERE c.vec_id <> q.query_id
  GROUP BY q.query_id, c.vec_id
)
SELECT query_id, neighbor_id, adc_d2, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY adc_d2, neighbor_id
  ) AS rn
  FROM adc
)
WHERE rn <= 5
"""


@register("q_knn_pq", oracle=_PQ_ORACLE, tags=("similarity", "approx"))
def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3d: product-quantization ANN — encode the corpus as M=4
    per-subspace codes against seeded codebooks, score queries by
    asymmetric distance (raw query subvector -> code centroid) summed
    decimal-exact over subspaces, top-5 per query (block comment
    above: compression is the scale story — the scoring join reads 4
    small ints per corpus vector, the query-side distance table is a
    320-row broadcast)."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", _as_double("embedding").alias("v"))
    # subvectors: (vec_id, m, vs)
    sub = base.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.slice("v", m * _PQ_SUBDIM + 1, _PQ_SUBDIM)
                    for m in range(_PQ_M)
                ]
            )
        ).alias("m", "vs"),
    )
    cb = sub.filter(F.col("vec_id") < _PQ_K).select(
        "m", F.col("vec_id").alias("code"), F.col("vs").alias("cbv")
    )
    d2 = (
        _dot("vs", "vs")
        - F.lit(2.0) * _dot("vs", "cbv")
        + _dot("cbv", "cbv")
    )
    d2r = F.floor(d2 * F.lit(1000000.0) + F.lit(0.5)).cast(
        "double"
    ) / F.lit(1000000.0)
    dist = sub.join(F.broadcast(cb), "m").select(
        "vec_id", "m", "code", d2r.alias("d2r")
    )
    w_code = Window.partitionBy("vec_id", "m").orderBy("d2r", "code")
    codes = (
        dist.withColumn("rn", F.row_number().over(w_code))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", "code")
    )
    qd = dist.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "m", "code", "d2r"
    )
    adc = (
        codes.join(F.broadcast(qd), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(
            F.sum(F.col("d2r").cast("decimal(18,6)"))
            .cast("double")
            .alias("adc_d2")
        )
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return adc.select(
        "query_id",
        "neighbor_id",
        "adc_d2",
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= 5)


_CENTROID_ORACLE = """
WITH ex AS (
  SELECT label, vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
), cent AS (
  SELECT label, pos,
    CAST(SUM(CAST(x AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS c
  FROM ex GROUP BY label, pos
), dist AS (
  SELECT ex.label, ex.vec_id,
    sqrt(CAST(SUM(CAST((x - c) * (x - c) AS DECIMAL(30,18))) AS DOUBLE))
      AS d
  FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
  GROUP BY ex.label, ex.vec_id
)
SELECT
  label,
  COUNT(*) AS n_vecs,
  CAST(FLOOR(
    (CAST(SUM(CAST(d AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*))
    * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS avg_dist
FROM dist
GROUP BY label
"""


@register("q_centroid_dist", oracle=_CENTROID_ORACLE, tags=("similarity",))
def q_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: per-label centroid + mean member distance (clustering-lite
    quality metric).  posexplode -> (label, pos) mean -> rejoin ->
    per-vector L2 -> per-label mean; every float reduction is an exact
    decimal sum so distributed merge order can't shift the hash.  The
    (label, pos) shuffle carries #labels x 64 rows — constant in input
    size; the rejoin broadcasts the centroid table."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", "vec_id", F.posexplode("embedding").alias("pos", "xf")
    ).select("label", "vec_id", "pos", F.col("xf").cast("double").alias("x"))
    cent = ex.groupBy("label", "pos").agg(
        (
            F.sum(F.col("x").cast("decimal(30,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    diff_sq = (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
    dist = (
        ex.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("label", "vec_id")
        .agg(
            F.sqrt(
                F.sum(diff_sq.cast("decimal(30,18)")).cast("double")
            ).alias("d")
        )
    )
    avg_d = F.sum(F.col("d").cast("decimal(30,12)")).cast("double") / F.count(
        F.lit(1)
    )
    return dist.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (
            F.floor(avg_d * F.lit(1000000.0) + F.lit(0.5)).cast("double")
            / F.lit(1000000.0)
        ).alias("avg_dist"),
    )


_LSH_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), pa AS (
  SELECT CAST((vec_id - 16) / 2 AS INTEGER) AS plane_id, v
  FROM e WHERE vec_id IN (16, 18, 20, 22)
), pb AS (
  SELECT CAST((vec_id - 17) / 2 AS INTEGER) AS plane_id, v
  FROM e WHERE vec_id IN (17, 19, 21, 23)
), planes AS (
  SELECT pa.plane_id, [pa.v[i] - pb.v[i] FOR i IN range(1, 65)] AS pv
  FROM pa JOIN pb ON pa.plane_id = pb.plane_id
), sig AS (
  SELECT e.vec_id,
    CAST(SUM(CASE WHEN FLOOR(list_dot_product(e.v, p.pv) * 1000000.0 + 0.5)
                       >= 0
             THEN CAST(POWER(2, p.plane_id) AS BIGINT) ELSE 0 END)
         AS BIGINT) AS bucket
  FROM e CROSS JOIN planes p
  GROUP BY e.vec_id
), n AS (
  SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm, s.bucket
  FROM e JOIN sig s USING (vec_id)
), scored AS (
  SELECT
    q.vec_id AS query_id,
    c.vec_id AS neighbor_id,
    CAST(FLOOR(
      (list_dot_product(q.v, c.v) / (q.nrm * c.nrm)) * 10000.0 + 0.5
    ) AS DOUBLE) / 10000.0 AS cos_sim
  FROM n q JOIN n c ON q.bucket = c.bucket
  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
  ) AS rn
  FROM scored
)
WHERE rn <= 3
"""


@register("q_knn_lsh", oracle=_LSH_ORACLE, tags=("similarity", "approx"))
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3c: LSH-bucketed approximate top-k — the random-hyperplane
    (SimHash-for-cosine) family next to q_knn_ivf's coarse quantizer.
    4 hyperplanes (differences of fixed seed-vector pairs, vec_id
    16..23 — deterministic, so the oracle is exact) give a 4-bit
    signature; candidates are restricted to signature-equal vectors,
    so the pair join is an equi-join on the bucket id and expected
    pair count drops ~16x (plane count trades recall for candidate
    volume: measured top-3-in-bucket precision vs the exact top-5 at
    sf0.01 is 0.50/0.23/0.13 for 3/4/5 planes).  Recall/probe
    trade-offs are banding knobs, not plan changes.  Sign decisions
    round the projection at 1e-6 so a last-ulp fold difference can't
    flip a bit across engines.

    Round-12 plan (the round-11 ratchet recorded 8 embeddings scans —
    the signature aggregate and the corpus⋈signature join were each
    referenced twice, re-executing the full corpus subtree ~4x): the 4
    hyperplanes are a CONSTANT-SIZE index artifact, so they are
    collected once (8 seed rows, row-group-pruned scan — the bounded
    build-time materialization, audited via pinning.audit_frame) and
    embedded as array literals.  The signature then becomes a per-row
    expression — a 4-term sum of sign bits — computed inline on (a)
    ONE full corpus scan for the candidate side and (b) one
    vec_id<10-pruned scan for the broadcast query side: no signature
    groupBy shuffle, no corpus self-join, no checkpoint of a
    corpus-sized frame, and exactly one full-corpus read at any scale.
    Python float subtraction building the plane literals is the same
    IEEE double op as the previous zip_with leg, so every projection
    bit is unchanged."""
    from flink_streaming_example_spark.operators.pinning import audit_frame

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    seed_rows = {
        r["vec_id"]: r["v"]
        for r in audit_frame(
            e.filter((F.col("vec_id") >= 16) & (F.col("vec_id") < 24))
        ).collect()
    }
    planes = [
        [x - y for x, y in zip(seed_rows[16 + 2 * i], seed_rows[17 + 2 * i])]
        for i in range(4)
    ]

    def bucket_of(vcol):
        bits = [
            F.when(
                F.floor(
                    _dot(vcol, F.array(*[F.lit(float(x)) for x in pv]))
                    * F.lit(1000000.0)
                    + F.lit(0.5)
                )
                >= 0,
                F.lit(1 << i).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for i, pv in enumerate(planes)
        ]
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out.cast("long")

    n = e.withColumn("nrm", F.sqrt(_dot("v", "v"))).withColumn(
        "bucket", bucket_of(F.col("v"))
    )
    q = (
        e.filter(F.col("vec_id") < 10)
        .withColumn("nrm", F.sqrt(_dot("v", "v")))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            bucket_of(F.col("v")).alias("qbucket"),
        )
    )
    scored = (
        F.broadcast(q)
        .join(
            n,
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _round4(_dot("qv", "v") / (F.col("qn") * F.col("nrm"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.select(
        "query_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)


_QUANTIZE_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS maxabs
  FROM e
), q AS (
  SELECT vec_id,
         127.0 / maxabs AS scale,
         list_transform(v, x -> CAST(FLOOR(x * (127.0 / maxabs) + 0.5)
                                     AS BIGINT)) AS qv
  FROM s
)
SELECT
  vec_id,
  CAST(FLOOR(scale * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS scale_r,
  CAST(list_sum(qv) AS BIGINT) AS q_sum,
  CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS q_norm2,
  CAST(list_max(qv) AS BIGINT) AS q_max,
  CAST(list_min(qv) AS BIGINT) AS q_min
FROM q
"""


@register("q_embed_quantize", oracle=_QUANTIZE_ORACLE, tags=("similarity",))
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3e: symmetric int8 vector quantization — per-vector scale
    127/max|x|, elementwise half-up rounding — the 4x memory/bandwidth
    reduction that makes billion-vector ANN shards fit executor memory
    (scan the int8 vectors, rescale only the top-k rerank candidates).

    The check emits integer invariants of the quantized vector
    (sum, L2^2, min, max) plus the 1e-6-rounded scale: integers are
    bit-deterministic across engines, so the parity check proves the
    quantization grid itself, not a float tolerance.  All expressions
    are codegen'd array natives (transform/aggregate) — no Python."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    scale = F.lit(127.0) / maxabs
    qv = F.transform(v, lambda x: F.floor(x * scale + F.lit(0.5)).cast("long"))
    zero = F.lit(0).cast("long")
    return emb.select(
        "vec_id",
        (
            F.floor(scale * F.lit(1000000.0) + F.lit(0.5)).cast("double")
            / F.lit(1000000.0)
        ).alias("scale_r"),
        F.aggregate(qv, zero, lambda acc, x: acc + x).alias("q_sum"),
        F.aggregate(qv, zero, lambda acc, x: acc + x * x).alias("q_norm2"),
        F.array_max(qv).alias("q_max"),
        F.array_min(qv).alias("q_min"),
    )


_ANN_RECALL_ORACLE = f"""
WITH exact_k AS ({_KNN_ORACLE}), appr_k AS ({_IVF_ORACLE})
SELECT e.query_id,
  CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
  CAST(COUNT(*) AS BIGINT) AS n_exact
FROM exact_k e LEFT JOIN appr_k a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


@register("q_ann_recall", oracle=_ANN_RECALL_ORACLE, tags=("similarity",))
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 audit of the IVF index against the exact scan — the
    QA query every ANN deployment runs before trusting the index:
    per query, how many of the true top-5 survive the bucket
    restriction.  Emitted as exact integer hits/total (no float
    ratio), so the check is bit-stable; the oracle recomputes BOTH
    pipelines and the same left-join census.  Plan shape: the two
    top-k frames are query-sized (k rows per query), so the audit
    join and rollup are trivially broadcastable no matter how large
    the corpus that produced them — auditing recall costs two index
    probes, not a third scan.

    Round-12: each probe frame is referenced exactly ONCE (the
    round-11 ratchet recorded 8 embeddings scans — the semi-join +
    rejoin form referenced ``exact`` twice, re-executing the full
    cosine subtree both times).  The census is now the oracle's own
    shape verbatim: one left join marking hits, one rollup counting
    rows and non-null marks — 6 scans, all of them the two probes'
    own documented structural cost (q_knn_cosine 2 + q_knn_ivf 4)."""
    exact = q_knn_cosine(spark, sf_dir).select("query_id", "neighbor_id")
    appr = q_knn_ivf(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    # Both frames are k-rows-per-query (invisible to Catalyst's size
    # estimates behind the windows), so the audit join carries an
    # explicit broadcast hint — true at any corpus scale by
    # construction.  (query_id, neighbor_id) is unique per side, so
    # the left join never inflates the exact row count.
    return (
        exact.join(F.broadcast(appr), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("n_hits"),
            F.count(F.lit(1)).alias("n_exact"),
        )
    )
