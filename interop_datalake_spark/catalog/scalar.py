"""Scalar-function catalog — string / date / math / conditional /
JSON / array surfaces (SURVEY §2.B "Scalar fns").

These are the building blocks the lake layer's own ops are made of
(R14 URI parse = regexp_extract, R15 MSH-9 = locate/substring/split,
R1 `_date` = date_format) — exercised here over the big tables so the
driver hash-checks each function family against DuckDB. All JVM-side
column expressions: the whole projection runs in one codegen stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from interop_datalake_spark.sources.tables import load_table, local_frame


def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.lower("p_type").alias("type_lower"),
            F.substring("p_name", 1, 5).alias("name_prefix"),
            F.length("p_name").alias("name_len"),
            F.locate("a", F.col("p_name")).alias("first_a"),
            F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"),
            F.element_at(F.split(F.col("p_type"), " "), -1).alias("type_tail"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.trim(F.lit("  x  ")).alias("trimmed"),
            F.lpad(F.col("p_brand"), 12, "0").alias("brand_padded"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        )
        .orderBy("p_partkey")
    )


SCALAR_STRING_ORACLE = """
SELECT p_partkey,
       upper(p_brand)                       AS brand_upper,
       lower(p_type)                        AS type_lower,
       substring(p_name, 1, 5)              AS name_prefix,
       length(p_name)                       AS name_len,
       strpos(p_name, 'a')                  AS first_a,
       regexp_extract(p_type, '^(\\w+)', 1) AS type_head,
       string_split(p_type, ' ')[-1]        AS type_tail,
       concat_ws('|', p_brand, p_type)      AS brand_type,
       trim('  x  ')                        AS trimmed,
       lpad(p_brand, 12, '0')               AS brand_padded,
       replace(p_name, ' ', '_')            AS name_snake
FROM part ORDER BY p_partkey
"""


def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.dayofmonth("o_orderdate").alias("dom"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("month_start"),
            F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
            F.datediff(
                F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("days_to_eoy"),
            F.quarter("o_orderdate").alias("qtr"),
            F.dayofweek("o_orderdate").alias("dow"),
        )
        .orderBy("o_orderkey")
    )


SCALAR_DATE_ORACLE = """
SELECT o_orderkey,
       year(o_orderdate)                                  AS yr,
       month(o_orderdate)                                 AS mo,
       day(o_orderdate)                                   AS dom,
       strftime(o_orderdate, '%Y-%m-%d')                  AS iso_date,
       date_trunc('month', o_orderdate)::DATE             AS month_start,
       (o_orderdate::DATE + INTERVAL 30 DAY)::DATE        AS due_date,
       datediff('day', o_orderdate::DATE, DATE '1998-12-31') AS days_to_eoy,
       quarter(o_orderdate)                               AS qtr,
       dayofweek(o_orderdate) + 1                         AS dow
FROM orders ORDER BY o_orderkey
"""


def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * 0.1, 3).alias("tenth"),
            # dtype parity with DuckDB (r1 failure): Spark ceil/floor
            # return BIGINT where DuckDB returns DOUBLE — values were
            # identical, the canonicalized "44" vs "44.0" hash differed
            F.ceil("l_quantity").cast("double").alias("qty_ceil"),
            F.floor(F.col("l_extendedprice") / 100).cast("double").alias("price_h"),
            F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
            F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
            F.round(F.pow(F.col("l_tax") + 1, 2), 6).alias("tax_sq"),
            F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
            (F.col("l_orderkey") % 7).alias("key_mod"),
            F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


SCALAR_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * 0.1, 3)   AS tenth,
       ceil(l_quantity)                  AS qty_ceil,
       floor(l_extendedprice / 100)      AS price_h,
       round(abs(l_discount - 0.05), 4)  AS disc_dev,
       round(sqrt(l_quantity), 6)        AS qty_sqrt,
       round(pow(l_tax + 1, 2), 6)       AS tax_sq,
       round(ln(l_extendedprice + 1), 6) AS price_ln,
       l_orderkey % 7                    AS key_mod,
       sign(l_discount - 0.05)::DOUBLE   AS disc_sign
FROM lineitem ORDER BY l_orderkey, l_linenumber
"""


def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "overdrawn")
            .when(F.col("c_acctbal") < 5000, "standard")
            .otherwise("premium")
            .alias("tier"),
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
                "segment_masked"
            ),
            F.greatest(F.round("c_acctbal", 2), F.lit(0.0)).alias("bal_floor0"),
            F.least(F.round("c_acctbal", 2), F.lit(1000.0)).alias("bal_cap1k"),
        )
        .orderBy("c_custkey")
    )


SCALAR_CONDITIONAL_ORACLE = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'overdrawn'
            WHEN c_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END                                   AS tier,
       coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER')      AS segment_masked,
       greatest(round(c_acctbal, 2), 0.0)                        AS bal_floor0,
       least(round(c_acctbal, 2), 1000.0)                        AS bal_cap1k
FROM customer ORDER BY c_custkey
"""


def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.props JSON access — the engine's FHIR-document field
    access pattern (SURVEY §1.4: query nested fields of the bronze
    resource_json with get_json_object)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k_value"),
            (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket"),
            F.get_json_object("props", "$.missing").alias("missing_field"),
        )
        .orderBy("event_id")
    )


SCALAR_JSON_ORACLE = """
SELECT event_id,
       json_extract(props, '$.k')::INT        AS k_value,
       json_extract(props, '$.k')::INT % 10   AS k_bucket,
       json_extract_string(props, '$.missing') AS missing_field
FROM events ORDER BY event_id
"""


def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array algebra over embeddings (size/element_at/slice/transform/
    aggregate) — the primitives under the similarity operators."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    return (
        emb.select(
            "vec_id",
            F.size(vec).alias("dim"),
            F.round(F.element_at(vec, 1).cast("double"), 6).alias("first_val"),
            F.round(
                F.aggregate(
                    vec, F.lit(0.0), lambda acc, v: acc + v.cast("double")
                ),
                4,
            ).alias("vec_sum"),
            F.round(
                F.aggregate(
                    F.slice(vec, 1, 8),
                    F.lit(0.0),
                    lambda acc, v: acc + v.cast("double") * v.cast("double"),
                ),
                4,
            ).alias("head8_sumsq"),
            F.round(
                F.aggregate(
                    F.transform(vec, lambda v: F.abs(v.cast("double"))),
                    F.lit(0.0),
                    lambda acc, v: F.greatest(acc, v),
                ),
                6,
            ).alias("linf_norm"),
        )
        .orderBy("vec_id")
    )


SCALAR_ARRAY_ORACLE = """
SELECT vec_id,
       len(embedding)                                   AS dim,
       round(embedding[1]::DOUBLE, 6)                   AS first_val,
       round(list_sum(list_transform(embedding, v -> v::DOUBLE)), 4) AS vec_sum,
       round(list_sum(list_transform(embedding[1:8], v -> v::DOUBLE * v::DOUBLE)), 4) AS head8_sumsq,
       round(list_max(list_transform(embedding, v -> abs(v::DOUBLE))), 6) AS linf_norm
FROM embeddings ORDER BY vec_id
"""


def scalar_string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String predicate + transform depth: contains/starts/ends, LIKE,
    regex match, initcap/reverse/repeat/translate/left/right."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.col("p_type").contains("BRASS").alias("has_brass"),
            F.col("p_type").startswith("STANDARD").alias("is_standard"),
            F.col("p_type").endswith("TIN").alias("is_tin"),
            F.col("p_name").like("%green%").alias("is_green"),
            F.col("p_type").rlike("^[A-Z]+ [A-Z]+").alias("two_words_caps"),
            F.initcap("p_type").alias("type_title"),
            F.reverse(F.col("p_brand")).alias("brand_rev"),
            F.repeat(F.lit("ab"), 3).alias("repeated"),
            F.translate(F.col("p_brand"), "#", "-").alias("brand_dash"),
            F.substring(F.col("p_name"), 1, 3).alias("name_left3"),
            F.col("p_name").substr(F.length("p_name") - 2, F.lit(3)).alias("name_right3"),
        )
        .orderBy("p_partkey")
    )


SCALAR_STRING_PRED_ORACLE = """
SELECT p_partkey,
       contains(p_type, 'BRASS')          AS has_brass,
       starts_with(p_type, 'STANDARD')    AS is_standard,
       suffix(p_type, 'TIN')              AS is_tin,
       p_name LIKE '%green%'              AS is_green,
       regexp_matches(p_type, '^[A-Z]+ [A-Z]+') AS two_words_caps,
       list_aggregate(list_transform(string_split(lower(p_type), ' '),
         w -> upper(w[1]) || w[2:]), 'string_agg', ' ') AS type_title,
       reverse(p_brand)                   AS brand_rev,
       repeat('ab', 3)                    AS repeated,
       replace(p_brand, '#', '-')         AS brand_dash,
       p_name[1:3]                        AS name_left3,
       p_name[-3:]                        AS name_right3
FROM part ORDER BY p_partkey
"""


def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL algebra on a pinned fixture: coalesce/nullif/nvl2,
    null-safe equality (<=>), IS [NOT] DISTINCT FROM, null ordering."""
    df = local_frame(spark,
        [(1, 10, 10), (2, None, 10), (3, 10, None), (4, None, None)],
        "row_id INT, a INT, b INT",
    )
    return df.select(
        "row_id",
        F.col("a").eqNullSafe(F.col("b")).alias("null_safe_eq"),
        F.coalesce("a", "b", F.lit(-1)).alias("first_non_null"),
        F.isnull("a").alias("a_is_null"),
        F.nvl2(F.col("a"), F.lit("has_a"), F.lit("no_a")).alias("nvl2_tag"),
        (F.col("a") + F.col("b")).alias("null_prop_sum"),
    ).orderBy("row_id")


NULL_SEMANTICS_ORACLE = """
SELECT row_id,
       a IS NOT DISTINCT FROM b          AS null_safe_eq,
       coalesce(a, b, -1)                AS first_non_null,
       a IS NULL                         AS a_is_null,
       CASE WHEN a IS NOT NULL THEN 'has_a' ELSE 'no_a' END AS nvl2_tag,
       a + b                             AS null_prop_sum
FROM (VALUES (1, 10, 10), (2, NULL, 10), (3, 10, NULL), (4, NULL, NULL))
     AS t(row_id, a, b)
ORDER BY row_id
"""


def array_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode/unnest surface: corpus word frequencies, top 20."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


ARRAY_EXPLODE_ORACLE = """
SELECT word, count(*) AS n FROM (
  SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word
  FROM documents
) GROUP BY word ORDER BY n DESC, word LIMIT 20
"""


def json_object_keys_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON document introspection: object keys + typed field access
    (schema_of_json-style discovery over the events props column)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.array_join(F.json_object_keys("props"), ",").alias("prop_keys"),
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .orderBy("event_id")
    )


JSON_KEYS_ORACLE = """
SELECT event_id,
       array_to_string(json_keys(props), ',') AS prop_keys,
       json_extract(props, '$.k')::INT        AS k
FROM events ORDER BY event_id
"""


def scalar_date_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        orders.select(
            "o_orderkey",
            F.add_months(d, 3).alias("plus3mo"),
            F.last_day(d).alias("month_end"),
            F.weekofyear(d).alias("iso_week"),
            F.dayofyear(d).alias("doy"),
            F.date_sub(d, 7).alias("week_before"),
            F.trunc(d, "year").alias("year_start"),
        )
        .orderBy("o_orderkey")
    )


SCALAR_DATE_EXT_ORACLE = """
SELECT o_orderkey,
       (o_orderdate::DATE + INTERVAL 3 MONTH)::DATE AS plus3mo,
       last_day(o_orderdate::DATE)                  AS month_end,
       weekofyear(o_orderdate::DATE)                AS iso_week,
       dayofyear(o_orderdate::DATE)                 AS doy,
       o_orderdate::DATE - 7                        AS week_before,
       date_trunc('year', o_orderdate::DATE)::DATE  AS year_start
FROM orders ORDER BY o_orderkey
"""


def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array algebra on word arrays: sort/distinct/contains/position/
    min/max/size — the list manipulation surface."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    return (
        docs.select(
            "doc_id",
            F.size(words).alias("n_words"),
            F.array_join(F.slice(F.array_sort(F.array_distinct(words)), 1, 5), ",").alias(
                "first5_sorted_uniq"
            ),
            F.array_contains(words, "spark").alias("has_spark"),
            F.array_position(words, "data").alias("data_pos"),
            F.array_min(words).alias("min_word"),
            F.array_max(words).alias("max_word"),
        )
        .orderBy("doc_id")
    )


SCALAR_ARRAY_OPS_ORACLE = """
WITH base AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents
)
SELECT doc_id,
       len(ws)                                                    AS n_words,
       array_to_string(list_sort(list_distinct(ws))[1:5], ',')    AS first5_sorted_uniq,
       list_contains(ws, 'spark')                                 AS has_spark,
       list_position(ws, 'data')                                  AS data_pos,
       list_min(ws)                                               AS min_word,
       list_max(ws)                                               AS max_word
FROM base ORDER BY doc_id
"""


def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = F.col("l_orderkey")
    b = F.col("l_partkey")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            a.bitwiseAND(b).alias("band"),
            a.bitwiseOR(b).alias("bor"),
            a.bitwiseXOR(b).alias("bxor"),
            F.shiftleft(F.col("l_linenumber"), 3).alias("shl"),
            F.shiftright(a, 2).alias("shr"),
            F.bit_count(a).alias("popcount"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


SCALAR_BITWISE_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_orderkey & l_partkey    AS band,
       l_orderkey | l_partkey    AS bor,
       xor(l_orderkey, l_partkey) AS bxor,
       l_linenumber << 3         AS shl,
       l_orderkey >> 2           AS shr,
       bit_count(l_orderkey)     AS popcount
FROM lineitem ORDER BY l_orderkey, l_linenumber
"""


def try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe variants: try_divide / try_cast /
    try_element_at — NULL instead of runtime error (the engine runs
    with ANSI on; these are the sanctioned escape hatches)."""
    df = local_frame(spark,
        [(1, 10.0, 2.0, "42"), (2, 5.0, 0.0, "abc"), (3, None, 1.0, None)],
        "row_id INT, num DOUBLE, den DOUBLE, txt STRING",
    )
    return df.select(
        "row_id",
        F.try_divide(F.col("num"), F.col("den")).alias("safe_div"),
        F.col("txt").try_cast("int").alias("safe_int"),
        F.try_element_at(F.split(F.coalesce(F.col("txt"), F.lit("")), ","), F.lit(5)).alias(
            "safe_elem"
        ),
    ).orderBy("row_id")


TRY_FUNCTIONS_ORACLE = """
SELECT row_id,
       CASE WHEN den = 0 THEN NULL ELSE num / den END AS safe_div,
       TRY_CAST(txt AS INT)                           AS safe_int,
       string_split(coalesce(txt, ''), ',')[5]        AS safe_elem
FROM (VALUES (1, 10.0, 2.0, '42'), (2, 5.0, 0.0, 'abc'),
             (3, NULL, 1.0, NULL)) AS t(row_id, num, den, txt)
ORDER BY row_id
"""


def scalar_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP column surface: construct, access, keys/values, cardinality
    (the engine's typed twin of the events.props JSON map)."""
    orders = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return (
        orders.select(
            "o_orderkey",
            F.element_at(m, "status").alias("status_val"),
            F.element_at(m, "priority").alias("priority_val"),
            F.size(m).alias("map_size"),
            F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        )
        .orderBy("o_orderkey")
    )


SCALAR_MAP_ORACLE = """
SELECT o_orderkey,
       m['status'][1]                                AS status_val,
       m['priority'][1]                              AS priority_val,
       cardinality(m)::INT                           AS map_size,
       array_to_string(list_sort(map_keys(m)), ',')  AS keys_sorted
FROM (
  SELECT o_orderkey,
         map(['status','priority'], [o_orderstatus, o_orderpriority]) AS m
  FROM orders
) ORDER BY o_orderkey
"""


QUERIES = {
    "scalar_string": scalar_string,
    "scalar_map_ops": scalar_map_ops,
    "scalar_date_extended": scalar_date_extended,
    "scalar_array_ops": scalar_array_ops,
    "scalar_bitwise": scalar_bitwise,
    "try_functions": try_functions,
    "array_explode_wordcount": array_explode_wordcount,
    "json_object_keys": json_object_keys_query,
    "scalar_string_predicates": scalar_string_predicates,
    "null_semantics": null_semantics,
    "scalar_date": scalar_date,
    "scalar_math": scalar_math,
    "scalar_conditional": scalar_conditional,
    "scalar_json": scalar_json,
    "scalar_array": scalar_array,
}

ORACLES = {
    "scalar_string": SCALAR_STRING_ORACLE,
    "scalar_map_ops": SCALAR_MAP_ORACLE,
    "scalar_date_extended": SCALAR_DATE_EXT_ORACLE,
    "scalar_array_ops": SCALAR_ARRAY_OPS_ORACLE,
    "scalar_bitwise": SCALAR_BITWISE_ORACLE,
    "try_functions": TRY_FUNCTIONS_ORACLE,
    "array_explode_wordcount": ARRAY_EXPLODE_ORACLE,
    "json_object_keys": JSON_KEYS_ORACLE,
    "scalar_string_predicates": SCALAR_STRING_PRED_ORACLE,
    "null_semantics": NULL_SEMANTICS_ORACLE,
    "scalar_date": SCALAR_DATE_ORACLE,
    "scalar_math": SCALAR_MATH_ORACLE,
    "scalar_conditional": SCALAR_CONDITIONAL_ORACLE,
    "scalar_json": SCALAR_JSON_ORACLE,
    "scalar_array": SCALAR_ARRAY_ORACLE,
}
