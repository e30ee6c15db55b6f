"""Scalar function surface — string/date/math/array/map/json/hash
families (SURVEY.md §2B table 7). One oracle query per family; every
expression is a built-in ``pyspark.sql.functions`` call (JVM-side,
whole-stage-codegen — no Python in the hot path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@query(
    "q32_string_funcs",
    oracle="""
SELECT c_custkey,
       concat_ws('|', c_name, c_mktsegment)            AS joined,
       substring(c_name, 1, 8)                         AS name_prefix,
       CAST(length(c_name) AS BIGINT)                  AS name_len,
       lower(c_mktsegment)                             AS seg_lower,
       upper(c_name)                                   AS name_upper,
       trim(c_mktsegment)                              AS seg_trim,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0')       AS key_padded,
       regexp_extract(c_name, '([0-9]+)', 1)           AS name_digits,
       regexp_replace(c_name, '[0-9]', '#', 'g')       AS name_masked,
       replace(c_mktsegment, 'A', '@')                 AS seg_replaced,
       CAST(strpos(c_name, '#') AS BIGINT)             AS hash_pos,
       starts_with(c_name, 'Customer')                 AS is_customer,
       CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev_building
FROM customer ORDER BY c_custkey
""",
)
def q32_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: concat/substring/length/case/trim/pad/regexp/
    replace/instr/startswith/levenshtein."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.upper("c_name").alias("name_upper"),
        F.trim("c_mktsegment").alias("seg_trim"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("name_masked"),
        F.replace(F.col("c_mktsegment"), F.lit("A"), F.lit("@")).alias("seg_replaced"),
        F.instr("c_name", "#").cast("bigint").alias("hash_pos"),
        F.startswith(F.col("c_name"), F.lit("Customer")).alias("is_customer"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).cast("bigint").alias("lev_building"),
    ).orderBy("c_custkey")


@query(
    "q33_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT)                               AS order_year,
       CAST(month(o_orderdate) AS BIGINT)                              AS order_month,
       CAST(day(o_orderdate) AS BIGINT)                                AS order_day,
       CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due_date,
       CAST(date_diff('day', CAST(o_orderdate AS DATE),
                      DATE '1998-12-01') AS BIGINT)                    AS days_to_cutoff,
       date_trunc('month', o_orderdate)                                AS order_month_start,
       CAST(epoch(o_orderdate) AS BIGINT)                              AS epoch_s,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR)            AS month_end,
       CAST(dayofweek(o_orderdate) AS BIGINT)                          AS dow_sun0,
       CAST(date_diff('month', date_trunc('month', o_orderdate),
                      DATE '1998-12-01') AS BIGINT)                    AS months_to_cutoff,
       strftime(make_timestamp(CAST(epoch(o_orderdate) AS BIGINT) * 1000000),
                '%Y-%m-%d %H:%M:%S')                                   AS ts_str
FROM orders ORDER BY o_orderkey
""",
)
def q33_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. Cross-engine notes: Spark dayofweek is 1-based
    Sunday=1 vs DuckDB Sunday=0 → normalize to Sunday=0; derived day
    counts cast to BIGINT on both sides."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("string").alias("due_date"),
        F.datediff(F.lit("1998-12-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_cutoff"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.unix_timestamp("o_orderdate").cast("bigint").alias("epoch_s"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("string").alias("month_end"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dow_sun0"),
        F.months_between(
            F.lit("1998-12-01").cast("date"), F.date_trunc("month", "o_orderdate")
        ).cast("bigint").alias("months_to_cutoff"),
        F.from_unixtime(F.unix_timestamp("o_orderdate")).alias("ts_str"),
    ).orderBy("o_orderkey")


@query(
    "q34_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05)                       AS abs_disc_dev,
       round(l_extendedprice)                       AS price_rounded,
       CAST(ceil(l_extendedprice) AS BIGINT)        AS price_ceil,
       CAST(floor(l_extendedprice) AS BIGINT)       AS price_floor,
       exp(l_discount)                              AS exp_disc,
       ln(l_quantity + 1)                           AS ln_qty,
       log10(l_extendedprice)                       AS log10_price,
       pow(l_discount, 2)                           AS disc_sq,
       sqrt(l_quantity)                             AS sqrt_qty,
       CAST(sign(l_discount - 0.05) AS DOUBLE)      AS sign_disc,
       CAST(((l_orderkey % 7) + 7) % 7 AS BIGINT)   AS key_pmod7
FROM lineitem ORDER BY l_orderkey, l_linenumber
""",
)
def q34_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (bround/rand are covered in unit tests: banker's
    rounding has no DuckDB twin and seeded rand is RNG-specific)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_dev"),
        F.round("l_extendedprice", 0).alias("price_rounded"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.exp("l_discount").alias("exp_disc"),
        F.log(F.col("l_quantity") + 1).alias("ln_qty"),
        F.log10("l_extendedprice").alias("log10_price"),
        F.pow("l_discount", 2).alias("disc_sq"),
        F.sqrt("l_quantity").alias("sqrt_qty"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("sign_disc"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("key_pmod7"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "q35_array_funcs",
    oracle="""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT)                                         AS n_tokens,
       toks[1]                                                           AS first_token,
       list_contains(toks, 'spark')                                      AS has_spark,
       array_to_string(list_sort(toks)[1:3], ',')                        AS first3_sorted,
       CAST(len(list_distinct(toks)) AS BIGINT)                          AS n_distinct_tokens,
       CAST(len(list_filter(toks, x -> length(x) > 4)) AS BIGINT)        AS n_long_tokens,
       CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)    AS total_chars
FROM d ORDER BY doc_id
""",
)
def q35_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order functions (transform/filter/
    aggregate) — lambdas run inside codegen, not Python."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    return d.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.element_at("toks", 1).alias("first_token"),
        F.array_contains("toks", "spark").alias("has_spark"),
        F.array_join(F.slice(F.sort_array("toks"), 1, 3), ",").alias("first3_sorted"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct_tokens"),
        F.size(F.filter("toks", lambda x: F.length(x) > 4)).cast("bigint").alias("n_long_tokens"),
        F.aggregate(
            F.transform("toks", lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    ).orderBy("doc_id")


@query(
    "q36_map_funcs",
    oracle="""
SELECT event_id,
       array_to_string(map_keys(
         map(['type', 'bucket'],
             [event_type, CASE WHEN value > 50 THEN 'hi' ELSE 'lo' END])), ',') AS keys_str,
       array_to_string(map_values(
         map(['type', 'bucket'],
             [event_type, CASE WHEN value > 50 THEN 'hi' ELSE 'lo' END])), ',') AS vals_str,
       CAST(cardinality(map(['type', 'bucket'],
             [event_type, CASE WHEN value > 50 THEN 'hi' ELSE 'lo' END])) AS BIGINT) AS n_entries,
       array_to_string(map_keys(map_concat(
             map(['type'], [event_type]), map(['src'], ['engine']))), ',') AS concat_keys,
       map(['type'], [event_type])['type'][1]                              AS type_val
FROM events ORDER BY event_id
""",
)
def q36_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: construction, key/value extraction, cardinality —
    compared via canonical strings (map hashing is engine-specific)."""
    ev = _t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"),
        F.col("event_type"),
        F.lit("bucket"),
        F.when(F.col("value") > 50, "hi").otherwise("lo"),
    )
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("keys_str"),
        F.array_join(F.map_values(m), ",").alias("vals_str"),
        F.size(F.map_keys(m)).cast("bigint").alias("n_entries"),
        F.array_join(
            F.map_keys(
                F.map_concat(
                    F.create_map(F.lit("type"), F.col("event_type")),
                    F.create_map(F.lit("src"), F.lit("engine")),
                )
            ),
            ",",
        ).alias("concat_keys"),
        F.element_at(F.create_map(F.lit("type"), F.col("event_type")), "type").alias(
            "type_val"
        ),
    ).orderBy("event_id")


@query(
    "q37_json_funcs",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k')            AS k_str,
       CAST(json_extract(props, '$.k') AS BIGINT)   AS k_int,
       to_json(struct_pack(k := CAST(json_extract(props, '$.k') AS BIGINT))) AS k_roundtrip,
       json_extract_string(props, '$.k')            AS k_tuple
FROM events ORDER BY event_id
""",
)
def q37_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: path extraction, schema-full parse (from_json),
    serialization (to_json) over the events.props JSON column."""
    ev = _t(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.to_json(F.struct(parsed.getField("k").alias("k"))).alias("k_roundtrip"),
        F.json_tuple(F.col("props"), "k").alias("k_tuple"),
    ).orderBy("event_id")


@query(
    "q115_variant_json",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(count(*) FILTER (
         WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50)
         AS BIGINT) AS n_high,
       CAST(sum(CASE WHEN try_cast(json_extract_string(props, '$.missing')
                               AS BIGINT) IS NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS n_missing
FROM events GROUP BY 1 ORDER BY 1
""",
)
def q115_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType semi-structured path (the modern replacement
    for schema-on-read get_json_object): props parsed ONCE to a binary
    variant (parse_json), fields then extracted by path with typed
    variant_get — at scale this is the difference between N JSON
    re-parses per row (q37's form) and one parse + cheap binary
    probes. try_variant_get on a missing path returns NULL instead of
    erroring, mirrored by the oracle's try_cast."""
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "bigint")
    missing = F.try_variant_get(v, "$.missing", "bigint")
    return (
        ev.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.sum((F.col("k") > 50).cast("long")).alias("n_high"),
            F.sum(F.col("m").isNull().cast("long")).alias("n_missing"),
        )
        .orderBy("event_type")
    )


@query(
    "q38_hash_funcs",
    oracle="""
SELECT doc_id,
       md5(text)    AS text_md5,
       sha256(text) AS text_sha256
FROM documents ORDER BY doc_id
""",
)
def q38_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard cryptographic hashes (cross-engine stable). Spark-native
    hash/xxhash64/crc32/monotonically_increasing_id are engine-specific
    → exercised in unit tests, not against the oracle."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
    ).orderBy("doc_id")


@query(
    "q39_try_cast",
    oracle="""
SELECT doc_id,
       TRY_CAST(lang AS INTEGER)                       AS lang_as_int,
       TRY_CAST(CAST(doc_id AS VARCHAR) AS INTEGER)    AS id_roundtrip,
       TRY_CAST(substr(text, 1, 1) AS DOUBLE)          AS first_char_num
FROM documents ORDER BY doc_id
""",
)
def q39_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe casts: the engine pins spark.sql.ansi.enabled=true
    (session.RUNTIME_CONFS), so a bad CAST errors; try_cast is the
    explicit NULL-on-failure opt-out, matching DuckDB TRY_CAST."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").try_cast("int").alias("lang_as_int"),
        F.col("doc_id").cast("string").try_cast("int").alias("id_roundtrip"),
        F.substring("text", 1, 1).try_cast("double").alias("first_char_num"),
    ).orderBy("doc_id")


@query(
    "q80_posexplode_zip",
    oracle="""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 20)
SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS tok,
       CAST(length(toks[i]) AS BIGINT) AS tok_len
FROM d, unnest(range(1, len(toks) + 1)) AS t(i)
ORDER BY doc_id, pos
""",
)
def q80_posexplode_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode + arrays_zip: tokens zipped with their lengths, then
    position-exploded (1 row -> N rows with ordinal). The oracle
    reconstructs ordinals with a range unnest (DuckDB lacks
    WITH ORDINALITY)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    toks = F.split("text", " ")
    zipped = F.arrays_zip(
        toks.alias("tok"), F.transform(toks, lambda x: F.length(x).cast("bigint")).alias("len")
    )
    return (
        d.select("doc_id", F.posexplode(zipped).alias("pos", "z"))
        .select(
            "doc_id",
            F.col("pos").cast("bigint"),
            F.col("z.tok").alias("tok"),
            F.col("z.len").alias("tok_len"),
        )
        .orderBy("doc_id", "pos")
    )


@query(
    "q139_try_functions",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_custkey % 3 = 0 THEN NULL
            ELSE o_totalprice / (o_custkey % 3) END AS safe_ratio,
       CAST(try_cast(substr(o_orderpriority, 1, 1) AS BIGINT) AS BIGINT)
         AS prio_num,
       string_split(o_orderpriority, '-')[3] AS third_part,
       CASE WHEN o_orderkey = 0 THEN 9223372036854775807
            ELSE NULL END AS overflow_add
FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
""",
)
def q139_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The error-safe ``try_*`` function family (beyond q39's
    try_cast): try_divide (zero divisor → NULL, planted via
    o_custkey%3), try_to_number (digit prefix parses, alpha would
    NULL), try_element_at (index past the array end → NULL — note
    1-based like SQL), try_add (BIGINT overflow → NULL instead of a
    runtime error — the contract that keeps a 100 TB job from dying
    on one poisoned row). The oracle states each as its explicit
    NULL-guard form."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 3).alias("safe_ratio"),
        F.expr("try_to_number(substring(o_orderpriority, 1, 1), '9')")
        .cast("bigint")
        .alias("prio_num"),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(3)).alias("third_part"),
        F.try_add(F.lit(9223372036854775807), F.col("o_orderkey")).alias("overflow_add"),
    ).orderBy("o_orderkey")
