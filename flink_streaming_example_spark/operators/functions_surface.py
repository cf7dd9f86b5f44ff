"""Scalar function surface (SURVEY.md §2.7) — one oracle-checked query
per family: string, date/time, math, conditional, JSON, array,
struct/map, hash.

All expressions are JVM builtins inside whole-stage codegen — no Python
anywhere.  Cross-engine parity rules baked into the oracles:
- DuckDB widens many scalar results (length/instr/year/ntile -> BIGINT,
  floor -> DOUBLE, sign -> TINYINT); each oracle casts back to Spark's
  type so the driver's schema compare sees identical dtypes.
- Only IEEE-exact double ops are emitted raw (abs, sqrt, x*x, min/max);
  anything transcendental (pow/log/exp are libm-dependent and can
  differ in the last ulp between the JVM and DuckDB's C runtime) is
  avoided or half-up-rounded via functions/stable.py.
- Hash family uses md5/sha256 (bit-identical standard digests in both
  engines).  Production dedup keys should prefer xxhash64 (cheaper,
  JVM-side, 8-byte output) — it has no DuckDB twin, so the verified
  surface pins the portable digests and dedup.py documents the swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Column

from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table


def _round6(c: Column) -> Column:
    """Mirrored IEEE half-up at 1e-6 (see functions/stable.py)."""
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("double") / F.lit(
        1000000.0
    )

_STRING_ORACLE = """
SELECT
  p_partkey,
  lower(p_name) AS name_lower,
  upper(p_brand) AS brand_upper,
  CAST(length(p_name) AS INTEGER) AS name_len,
  substring(p_type, 1, 6) AS type_prefix,
  string_split(p_type, ' ')[1] AS type_class,
  concat_ws('|', p_brand, p_type) AS brand_type,
  regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
  trim(concat(' ', p_name, ' ')) AS name_trimmed,
  regexp_replace(p_type, ' ', '_', 'g') AS type_snake,
  starts_with(p_type, 'STANDARD') AS is_standard,
  CAST(instr(p_name, 'o') AS INTEGER) AS first_o,
  p_name LIKE '%art%' AS has_art
FROM part
"""


@register("q_string_funcs", oracle=_STRING_ORACLE, tags=("functions",))
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-str: lower/upper/length/substring/split/concat_ws/regexp_*/
    trim/startswith/instr over part."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 6).alias("type_prefix"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_class"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract(F.col("p_brand"), r"Brand#(\d+)", 1).alias("brand_num"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
        F.regexp_replace(F.col("p_type"), " ", "_").alias("type_snake"),
        F.col("p_type").startswith("STANDARD").alias("is_standard"),
        F.instr(F.col("p_name"), "o").alias("first_o"),
        F.col("p_name").like("%art%").alias("has_art"),
    )


_DATETIME_ORACLE = """
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS INTEGER) AS yr,
  CAST(month(o_orderdate) AS INTEGER) AS mo,
  CAST(day(o_orderdate) AS INTEGER) AS dom,
  date_trunc('month', o_orderdate) AS month_start,
  strftime(o_orderdate, '%Y-%m') AS ym,
  CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INTEGER)
    AS days_since_95,
  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date
FROM orders
"""


@register("q_datetime_funcs", oracle=_DATETIME_ORACLE, tags=("functions",))
def q_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-dt: year/month/day/date_trunc/date_format/datediff/
    unix_timestamp over orders (tz-naive, session pinned UTC so epoch
    seconds agree)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias(
            "month_start"
        ),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("epoch_s"),
        # DATE objects reach pandas differently per engine (date vs
        # midnight datetime64) — stringified for a stable compare
        F.to_date(F.col("o_orderdate")).cast("string").alias("order_date"),
    )


_MATH_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  abs(l_discount - 0.05) AS abs_dev,
  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
  sqrt(l_extendedprice) AS price_sqrt,
  l_tax * l_tax AS tax_sq,
  CAST(mod(l_orderkey, 7) AS BIGINT) AS mod7,
  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn,
  CAST(FLOOR(ln(l_extendedprice) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
    AS log_price,
  CAST(FLOOR(exp(l_discount) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
    AS exp_disc,
  CAST(FLOOR(pow(l_quantity, 1.5) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
    AS qty_pow
FROM lineitem
WHERE l_orderkey % 4 = 0
"""


@register("q_math_funcs", oracle=_MATH_ORACLE, tags=("functions",))
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-math: abs/floor/ceil/sqrt/square/pmod/sign over lineitem.
    Only IEEE-exact ops (sqrt is correctly rounded; x*x is one
    multiply); pmod inputs are non-negative so mod semantics agree.
    Sampled to 1/4 of the fact table (mirrored modulo filter) — the
    family demo needs function coverage, not scan volume."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 4 == 0
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_tax") * F.col("l_tax")).alias("tax_sq"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
        # transcendentals are libm-dependent (can differ from DuckDB in
        # the last ulp) — half-up-rounded at 1e-6 on both sides
        _round6(F.log(F.col("l_extendedprice"))).alias("log_price"),
        _round6(F.exp(F.col("l_discount"))).alias("exp_disc"),
        _round6(F.pow(F.col("l_quantity"), F.lit(1.5))).alias("qty_pow"),
    )


_COND_ORACLE = """
SELECT
  o_orderkey,
  CASE WHEN o_orderstatus = 'F' THEN 'fulfilled'
       WHEN o_orderstatus = 'O' THEN 'open'
       ELSE 'pending' END AS status_label,
  CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS priority_rank,
  o_totalprice > 400000 AS is_big,
  least(o_totalprice, 450000.0) AS capped,
  greatest(o_totalprice, 100000.0) AS floored,
  coalesce(nullif(o_orderstatus, 'P'), 'UNKNOWN') AS status_or_unknown
FROM orders
"""


@register("q_conditional_funcs", oracle=_COND_ORACLE, tags=("functions",))
def q_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-cond: when/otherwise, coalesce(nullif), greatest/least over
    orders — all exact comparisons and picks, no float synthesis."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "fulfilled")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("pending")
        .alias("status_label"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("priority_rank"),
        (F.col("o_totalprice") > 400000).alias("is_big"),
        F.least(F.col("o_totalprice"), F.lit(450000.0)).alias("capped"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("floored"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("UNKNOWN"))
        .alias("status_or_unknown"),
    )


_JSON_ORACLE = """
SELECT
  event_id,
  json_extract(props, '$.k')::INTEGER AS k_val,
  json_extract_string(props, '$.k') AS k_str,
  json_extract(props, '$.k') IS NOT NULL AS has_k,
  CAST(length(props) AS INTEGER) AS props_len,
  to_json(struct_pack(k := json_extract(props, '$.k')::INTEGER,
                      t := event_type)) AS packed
FROM events
"""


@register("q_json_funcs", oracle=_JSON_ORACLE, tags=("functions",))
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-json: from_json (typed) + get_json_object (string path) over
    events.props; schema always declared, never inferred."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT").getField("k")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        F.get_json_object(F.col("props"), "$.k").alias("k_str"),
        k.isNotNull().alias("has_k"),
        F.length("props").alias("props_len"),
        # both engines serialize structs as {"k":87,"t":"click"} —
        # byte-identical compact JSON
        F.to_json(
            F.struct(k.alias("k"), F.col("event_type").alias("t"))
        ).alias("packed"),
    )


_ARRAY_ORACLE = """
SELECT
  vec_id,
  CAST(len(embedding) AS INTEGER) AS dim,
  CAST(embedding[1] AS DOUBLE) AS e0,
  CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
  CAST(FLOOR(
    list_sum(list_transform(embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
    * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS dot_self,
  CAST(list_max(embedding[1:3]) AS DOUBLE) AS first3_max
FROM embeddings
"""


@register("q_array_funcs", oracle=_ARRAY_ORACLE, tags=("functions",))
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-arr: size/element_at/filter/transform/aggregate/slice/
    array_max over the 64-dim embedding vectors — the expression-only
    dot product that keeps similarity search UDF-free (SURVEY §2.7);
    the fold is sequential in both engines, half-up-rounded at 1e-6 to
    absorb any last-ulp accumulation skew."""
    e = load_table(spark, sf_dir, "embeddings")
    dot_self = F.aggregate(
        F.transform(
            F.col("embedding"), lambda x: x.cast("double") * x.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("e0"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
        (
            F.floor(dot_self * F.lit(1000000.0) + F.lit(0.5)).cast("double")
            / F.lit(1000000.0)
        ).alias("dot_self"),
        F.array_max(F.slice(F.col("embedding"), 1, 3)).cast("double").alias(
            "first3_max"
        ),
    )


_STRUCT_ORACLE = """
SELECT
  n_nationkey,
  struct_pack(name := n_name, rk := n_regionkey).name AS packed_name,
  struct_pack(name := n_name, rk := n_regionkey).rk AS packed_rk,
  MAP(['rk'], [n_regionkey])['rk'][1] AS rk_from_map
FROM nation
"""


@register("q_struct_funcs", oracle=_STRUCT_ORACLE, tags=("functions",))
def q_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-map/struct: struct pack/extract roundtrip + map build/lookup
    over nation (scalars out — engines' composite wire formats differ,
    so the checkable surface is field extraction)."""
    n = load_table(spark, sf_dir, "nation")
    s = F.struct(
        F.col("n_name").alias("name"), F.col("n_regionkey").alias("rk")
    )
    m = F.create_map(F.lit("rk"), F.col("n_regionkey"))
    return n.select(
        "n_nationkey",
        s.getField("name").alias("packed_name"),
        s.getField("rk").alias("packed_rk"),
        F.element_at(m, "rk").alias("rk_from_map"),
    )


_HASH_ORACLE = """
SELECT
  doc_id,
  md5(text) AS text_md5,
  sha256(text) AS text_sha256,
  md5(concat(lang, '|', text)) AS salted_md5
FROM documents
"""


@register("q_hash_funcs", oracle=_HASH_ORACLE, tags=("functions",))
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-hash: md5/sha2 content digests over documents — the portable
    fingerprint surface (see module docstring re xxhash64 at scale)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.concat(F.col("lang"), F.lit("|"), F.col("text"))).alias(
            "salted_md5"
        ),
    )


_MAP_ORACLE = """
SELECT
  p_partkey,
  p_brand AS brand_val,
  'none' AS missing_val,
  'brand,type' AS keys_sorted,
  upper(p_type) AS type_upper,
  concat('brand=', p_brand, ';type=', p_type) AS entries_str,
  CAST(1 AS INTEGER) AS n_brand_only,
  CAST(3 AS INTEGER) AS n_merged,
  CAST(p_size AS VARCHAR) AS size_back,
  TRUE AS has_type,
  concat(p_brand, '|', p_type) AS zipped_brandtype
FROM part
"""


@register("q_map_funcs", oracle=_MAP_ORACLE, tags=("functions",))
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-map (the §2.7 family q_struct_funcs only touched): the full
    map higher-order surface — element_at (incl. missing-key NULL),
    map_keys, transform_values, map_entries + per-entry transform,
    map_filter, map_concat (later map wins on key collision is NOT
    relied on — keys are disjoint), map_contains_key and map_zip_with
    — all JVM builtins in whole-stage codegen.  Engines' map wire
    formats differ (and DuckDB iterates MAPs in insertion order only),
    so the checkable surface is scalars extracted AFTER each
    operation; the oracle states each expected scalar directly from
    the base columns, which is exactly what makes a semantics drift
    (e.g. map_concat dropping entries, map_zip_with nulling a
    one-sided key) hash-visible."""
    p = load_table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    m2 = F.create_map(F.lit("size"), F.col("p_size").cast("string"))
    zw = F.map_zip_with(
        m,
        F.create_map(F.lit("brand"), F.col("p_type")),
        lambda k, v1, v2: F.concat_ws("|", v1, v2),
    )
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_val"),
        F.coalesce(F.element_at(m, "nope"), F.lit("none")).alias(
            "missing_val"
        ),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(
            F.transform_values(m, lambda k, v: F.upper(v)), "type"
        ).alias("type_upper"),
        F.array_join(
            F.transform(
                F.map_entries(m),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            ),
            ";",
        ).alias("entries_str"),
        F.size(F.map_filter(m, lambda k, v: k == F.lit("brand"))).alias(
            "n_brand_only"
        ),
        F.size(F.map_concat(m, m2)).alias("n_merged"),
        F.element_at(F.map_concat(m, m2), "size").alias("size_back"),
        F.map_contains_key(m, "type").alias("has_type"),
        F.element_at(zw, "brand").alias("zipped_brandtype"),
    )
