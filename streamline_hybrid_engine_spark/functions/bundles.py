"""Scalar function bundles — SURVEY §2.8.

Reference analog: Flink 1.4's Table/SQL built-in surface, Janino-code-gen'd
by ``CodeGenerator.scala``. Every function here is a ``pyspark.sql.functions``
built-in (JVM, whole-stage codegen — the hot path never touches Python).
Coverage is proven in bundles: one contract query exercises a whole family.

Cross-engine notes baked into the oracles:
- DuckDB has no ``initcap``/``overlay`` → emulated in oracle SQL;
- DuckDB ``dayofweek`` is 0=Sunday vs Spark 1=Sunday → oracle adds 1;
- double→int CASTs round in DuckDB but truncate in Spark → bundle uses
  explicit floor/round instead; decimal casts keep scale ≥ data scale so
  no rounding-mode ties can arise.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.functions.numeric import rnd
from streamline_hybrid_engine_spark.registry import query


@query(
    "fn_string_bundle",
    oracle="""
    SELECT p_partkey,
           length(p_name) AS name_len,
           upper(p_name) AS name_up,
           lower(p_brand) AS brand_lo,
           array_to_string(list_transform(string_split(p_name, ' '),
             w -> upper(substr(w,1,1)) || lower(substr(w,2,999))), ' ') AS name_cap,
           trim('  ' || p_name || ' ') AS name_trim,
           ltrim('xx' || p_name, 'x') AS name_ltrim,
           rtrim(p_name || 'yy', 'y') AS name_rtrim,
           substr(p_name, 2, 4) AS name_sub,
           strpos(p_name, 'r') AS r_pos,
           substr(p_name,1,1) || 'XX' || substr(p_name,4,100000) AS name_overlay,
           p_brand || '-' || p_type AS brand_type,
           concat_ws('/', p_brand, p_type, p_name) AS joined,
           CASE WHEN p_name LIKE '%ring%' THEN 1 ELSE 0 END AS has_ring,
           CASE WHEN regexp_matches(p_name, '^[a-z]+ [a-z]+$') THEN 1 ELSE 0 END AS two_words,
           replace(p_name, ' ', '_') AS name_us,
           repeat(p_brand, 2) AS brand2,
           lpad(CAST(p_size AS VARCHAR), 5, '0') AS size_pad,
           reverse(p_brand) AS brand_rev,
           split_part(p_name, ' ', 2) AS second_word,
           translate(p_name, 'aeiou', 'AEIOU') AS name_trans
    FROM part
    """,
    tags=("functions", "string"),
)
def fn_string_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family: CHAR_LENGTH/UPPER/LOWER/INITCAP/TRIM/SUBSTRING/
    POSITION/OVERLAY/CONCAT/CONCAT_WS/LIKE/SIMILAR TO/REPLACE + extras."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.length("p_name").alias("name_len"),
        F.upper("p_name").alias("name_up"),
        F.lower("p_brand").alias("brand_lo"),
        F.initcap("p_name").alias("name_cap"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.ltrim(F.concat(F.lit("xx"), F.col("p_name")), F.lit("x")).alias("name_ltrim"),
        F.rtrim(F.concat(F.col("p_name"), F.lit("yy")), F.lit("y")).alias("name_rtrim"),
        F.substring("p_name", 2, 4).alias("name_sub"),
        F.locate("r", F.col("p_name")).alias("r_pos"),
        F.overlay("p_name", F.lit("XX"), 2, 2).alias("name_overlay"),
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
        F.concat_ws("/", "p_brand", "p_type", "p_name").alias("joined"),
        F.when(F.col("p_name").like("%ring%"), 1).otherwise(0).alias("has_ring"),
        F.when(F.col("p_name").rlike("^[a-z]+ [a-z]+$"), 1).otherwise(0).alias("two_words"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.repeat(F.col("p_brand"), 2).alias("brand2"),
        F.lpad(F.col("p_size").cast("string"), 5, "0").alias("size_pad"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.translate(F.col("p_name"), "aeiou", "AEIOU").alias("name_trans"),
    )


@query(
    "fn_math_bundle",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6) AS abs_d,
           mod(l_linenumber, 3) AS mod3,
           round(sqrt(l_extendedprice), 6) AS sqrt_p,
           round(pow(l_quantity, 1.5), 6) AS pow_q,
           round(exp(l_discount), 6) AS exp_d,
           round(ln(l_extendedprice), 6) AS ln_p,
           round(log10(l_extendedprice), 6) AS log10_p,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS ceil_k,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS floor_k,
           round(l_extendedprice, 1) AS round_1,
           CAST(sign(l_discount - 0.05) AS INT) AS sgn,
           round(sin(l_discount), 6) AS sin_d,
           round(cos(l_discount), 6) AS cos_d,
           round(tan(l_discount), 6) AS tan_d,
           round(atan2(l_discount, l_tax + 0.01), 6) AS at2,
           round(degrees(l_discount), 6) AS deg_d,
           round(pi(), 6) AS pi_c,
           round(greatest(l_discount, l_tax), 6) AS gr,
           round(least(l_discount, l_tax), 6) AS le
    FROM lineitem WHERE l_orderkey < 1000
    """,
    tags=("functions", "math"),
)
def fn_math_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: ABS/MOD/SQRT/POWER/EXP/LN/LOG10/CEIL/FLOOR/ROUND/SIGN/
    trig/PI/GREATEST/LEAST (RAND excluded: nondeterministic by definition)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    d, t, p, q = (F.col(c) for c in ("l_discount", "l_tax", "l_extendedprice", "l_quantity"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rnd(F.abs(d - 0.05), "abs_d"),
        (F.col("l_linenumber") % 3).alias("mod3"),
        rnd(F.sqrt(p), "sqrt_p"),
        rnd(F.pow(q, 1.5), "pow_q"),
        rnd(F.exp(d), "exp_d"),
        rnd(F.log(p), "ln_p"),
        rnd(F.log10(p), "log10_p"),
        F.ceil(p / 1000).alias("ceil_k"),
        F.floor(p / 1000).alias("floor_k"),
        F.round(p, 1).alias("round_1"),
        F.signum(d - 0.05).cast("int").alias("sgn"),
        rnd(F.sin(d), "sin_d"),
        rnd(F.cos(d), "cos_d"),
        rnd(F.tan(d), "tan_d"),
        rnd(F.atan2(d, t + 0.01), "at2"),
        rnd(F.degrees(d), "deg_d"),
        rnd(F.lit(3.141592653589793), "pi_c"),
        rnd(F.greatest(d, t), "gr"),
        rnd(F.least(d, t), "le"),
    )


@query(
    "fn_datetime_bundle",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           quarter(o_orderdate) AS q,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           dayofweek(o_orderdate) + 1 AS dow,
           dayofyear(o_orderdate) AS doy,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS eom,
           date_trunc('month', o_orderdate) AS month_start,
           strftime(o_orderdate, '%Y-%m') AS ym,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
           o_orderdate + INTERVAL 90 DAY AS due_date,
           extract(year FROM o_orderdate) AS ey
    FROM orders WHERE o_orderkey < 2000
    """,
    tags=("functions", "datetime"),
)
def fn_datetime_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: EXTRACT/YEAR/QUARTER/FLOOR-to-unit/DATE_FORMAT/
    TIMESTAMPADD/TIMESTAMPDIFF (CURRENT_TIMESTAMP excluded: nondeterministic)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    dt = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(dt).alias("y"),
        F.quarter(dt).alias("q"),
        F.month(dt).alias("m"),
        F.dayofmonth(dt).alias("d"),
        F.dayofweek(dt).alias("dow"),
        F.dayofyear(dt).alias("doy"),
        F.last_day(dt).cast("string").alias("eom"),
        F.date_trunc("month", dt).alias("month_start"),
        F.date_format(dt, "yyyy-MM").alias("ym"),
        F.datediff(dt, F.lit("1995-01-01").cast("timestamp")).alias("days_since"),
        (dt + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.extract(F.lit("year"), dt).cast("long").alias("ey"),
    )


@query(
    "fn_array_bundle",
    oracle="""
    SELECT vec_id, label,
           len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS e0,
           round(CAST(embedding[64] AS DOUBLE), 6) AS e_last,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS e_max,
           round(CAST(list_min(embedding) AS DOUBLE), 6) AS e_min,
           array_to_string(list_transform(embedding[1:3], x -> CAST(CAST(round(CAST(x AS DOUBLE), 4) AS DECIMAL(14,4)) AS VARCHAR)), ',') AS head3,
           CASE WHEN list_contains(list_transform(embedding, x -> x > 0), true) THEN 1 ELSE 0 END AS any_pos
    FROM embeddings
    """,
    tags=("functions", "array"),
)
def fn_array_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: CARDINALITY/ELEMENT-at/slice/min/max/transform/exists
    over the 64-dim embedding column (higher-order functions, all JVM)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    return e.select(
        "vec_id",
        "label",
        F.size(v).alias("dim"),
        rnd(F.element_at(v, 1).cast("double"), "e0"),
        rnd(F.element_at(v, 64).cast("double"), "e_last"),
        rnd(F.array_max(v).cast("double"), "e_max"),
        rnd(F.array_min(v).cast("double"), "e_min"),
        F.array_join(
            F.transform(
                F.slice(v, 1, 3),
                lambda x: F.round(x.cast("double"), 4).cast("decimal(14,4)").cast("string"),
            ),
            ",",
        ).alias("head3"),
        F.when(F.exists(v, lambda x: x > 0), 1).otherwise(0).alias("any_pos"),
    )


@query(
    "fn_json_props",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS INT) AS k_int,
           CASE WHEN CAST(json_extract(props, '$.k') AS INT) >= 50 THEN 'hi' ELSE 'lo' END AS k_band
    FROM events
    """,
    tags=("functions", "json"),
)
def fn_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (not in Flink 1.4 core — UDF there;
    first-class here via get_json_object/from_json)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        F.when(k.cast("int") >= 50, "hi").otherwise("lo").alias("k_band"),
    )


@query(
    "fn_cast_bundle",
    oracle="""
    SELECT l_orderkey,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_back,
           CAST(l_linenumber AS BIGINT) AS line_big,
           CAST(l_linenumber AS DOUBLE) AS line_dbl,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS VARCHAR) AS price_dec_str,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_str,
           CAST(l_returnflag = 'R' AS INT) AS is_r
    FROM lineitem WHERE l_orderkey < 1000
    """,
    tags=("functions", "cast"),
)
def fn_cast_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST matrix across §1.2 types (int/string/double/decimal/date/bool).

    l_quantity is integral-valued (verified) so the double→bigint cast is
    exact; arbitrary double→int casts are excluded — DuckDB rounds while
    Spark truncates (engine-semantic divergence, documented SURVEY §2.8).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_orderkey").cast("string").cast("bigint").alias("key_back"),
        F.col("l_linenumber").cast("bigint").alias("line_big"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.col("l_extendedprice").cast("decimal(18,4)").cast("string").alias("price_dec_str"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_date"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_str"),
        (F.col("l_returnflag") == "R").cast("int").alias("is_r"),
    )


@query(
    "fn_regex_bundle",
    oracle=r"""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS digits_int,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
           regexp_matches(c_name, '^Customer#[0-9]+$') AS well_formed,
           regexp_matches(c_name, '00$') AS ends_00
    FROM customer WHERE c_custkey < 500
    """,
    tags=("functions", "regex"),
)
def fn_regex_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface (Flink SQL REGEXP / REGEXP_EXTRACT / REGEXP_REPLACE):
    group extraction, global replacement, full/partial match predicates.
    Patterns stay in the Java-regex ∩ RE2 portable subset (char classes,
    anchors, quantifiers — no backrefs/lookaround), which is also the
    discipline a cross-engine lake pipeline must follow. Spark's
    regexp_replace is global by default; the oracle passes DuckDB's 'g'
    flag for the same semantics."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    digits = F.regexp_extract("c_name", r"([0-9]+)", 1)
    return c.select(
        "c_custkey",
        digits.alias("digits"),
        digits.cast("long").alias("digits_int"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
        F.col("c_name").rlike(r"^Customer#[0-9]+$").alias("well_formed"),
        F.col("c_name").rlike(r"00$").alias("ends_00"),
    )


@query(
    "fn_bitwise_bundle",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_partkey & l_suppkey AS BIGINT) AS band,
           CAST(l_partkey | l_suppkey AS BIGINT) AS bor,
           CAST(xor(l_partkey, l_suppkey) AS BIGINT) AS bxor,
           CAST(~l_partkey AS BIGINT) AS bnot,
           CAST(l_linenumber << 3 AS BIGINT) AS shl,
           CAST(l_partkey >> 2 AS BIGINT) AS shr,
           CAST(bit_count(CAST(l_partkey AS BIGINT)) AS BIGINT) AS bits
    FROM lineitem
    WHERE l_orderkey < 2000
    """,
    tags=("functions",),
)
def fn_bitwise_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface: AND/OR/XOR/NOT, shifts, popcount — all
    JVM codegen. Dialect note: Spark spells XOR ``^`` while DuckDB's ``^``
    is exponentiation (its XOR is ``xor()``); NOT is ``~`` in both. Every
    result casts to BIGINT on both engines so the value hash is
    dtype-stable."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    b = lambda c: c.cast("long")  # noqa: E731
    return li.select(
        "l_orderkey",
        "l_linenumber",
        b(F.expr("l_partkey & l_suppkey")).alias("band"),
        b(F.expr("l_partkey | l_suppkey")).alias("bor"),
        b(F.expr("l_partkey ^ l_suppkey")).alias("bxor"),
        b(F.expr("~l_partkey")).alias("bnot"),
        b(F.expr("shiftleft(l_linenumber, 3)")).alias("shl"),
        b(F.expr("shiftright(l_partkey, 2)")).alias("shr"),
        b(F.bit_count(F.col("l_partkey").cast("long"))).alias("bits"),
    )


@query(
    "fn_struct_bundle",
    oracle="""
    SELECT o_orderkey,
           ({'status': o_orderstatus,
             'price_cents': CAST(round(o_totalprice * 100) AS BIGINT)}).status
             AS status,
           ({'status': o_orderstatus,
             'price_cents': CAST(round(o_totalprice * 100) AS BIGINT)}).price_cents
             AS price_cents,
           ({'a': {'k': o_orderkey % 7}}).a.k AS k7,
           CASE WHEN {'s': o_orderstatus} = {'s': 'F'} THEN 1 ELSE 0 END AS is_f,
           element_at(MAP(['lo', 'hi'], [o_orderkey, o_orderkey + 1]), 'hi')[1]
             AS m_hi,
           array_to_string(map_keys(MAP(['lo', 'hi'], [o_orderkey, o_orderkey + 1])), ',')
             AS m_keys
    FROM orders
    WHERE o_orderkey < 3000
    """,
    tags=("functions", "struct"),
)
def fn_struct_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type surface: struct construction, field access (one and two
    levels), struct equality, map construction/element/keys — flattened
    back to scalar columns so the cross-engine hash sees plain values.
    Dialect notes: DuckDB map element_at returns a LIST (unwrap with
    ``[1]``); Spark's is scalar. Struct comparison is field-ordered in
    both engines."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    info = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    nested = F.struct(F.struct((F.col("o_orderkey") % 7).alias("k")).alias("a"))
    m = F.map_from_arrays(
        F.array(F.lit("lo"), F.lit("hi")),
        F.array(F.col("o_orderkey"), F.col("o_orderkey") + 1),
    )
    return o.select(
        "o_orderkey",
        info.getField("status").alias("status"),
        info.getField("price_cents").alias("price_cents"),
        nested.getField("a").getField("k").alias("k7"),
        F.when(
            F.struct(F.col("o_orderstatus").alias("s"))
            == F.struct(F.lit("F").alias("s")),
            1,
        )
        .otherwise(0)
        .alias("is_f"),
        F.element_at(m, "hi").alias("m_hi"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
    )


@query(
    "fn_try_bundle",
    oracle="""
    SELECT l_linenumber,
           CASE WHEN l_linenumber <> 0 THEN CAST(floor(100 / l_linenumber) AS BIGINT)
                ELSE NULL END AS try_div,
           TRY_CAST(l_returnflag AS INTEGER) AS try_cast_int,
           TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS try_cast_back,
           count(*) AS n
    FROM lineitem
    GROUP BY 1, 2, 3, 4
    """,
    tags=("functions", "ansi"),
)
def fn_try_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_* error-safe arithmetic under ANSI mode: the engine runs with
    ANSI on (overflow/bad-cast THROW, matching the oracle), so the escape
    hatches matter — try_divide → NULL instead of division-by-zero error,
    try_cast → NULL instead of malformed-cast error. DuckDB has TRY_CAST
    but no try_divide; its oracle face is the explicit CASE guard, which
    is exactly the semantics try_divide promises."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_linenumber",
            F.floor(F.try_divide(F.lit(100), F.col("l_linenumber")))
            .cast("bigint")
            .alias("try_div"),
            F.col("l_returnflag").try_cast("int").alias("try_cast_int"),
            F.col("l_quantity").cast("string").try_cast("double").alias("try_cast_back"),
        )
        .groupBy("l_linenumber", "try_div", "try_cast_int", "try_cast_back")
        .agg(F.count("*").alias("n"))
    )


@query(
    "fn_variant_json",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS INT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("functions", "json", "variant"),
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion of semi-structured data: `parse_json`
    builds the binary variant encoding ONCE, then `variant_get` extracts
    typed paths without re-parsing text per access — the modern engine
    path for JSON-heavy event streams (vs `get_json_object`, which
    re-parses the string per call; that legacy face is `fn_json_props`).
    The oracle is DuckDB's native JSON extraction — same typed values.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


@query(
    "fn_url_bundle",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '&v=2#sec1' AS url,
             source, lang
      FROM documents
    )
    SELECT doc_id,
           url,
           source || '.example.com' AS host,
           '/docs/' || doc_id AS path,
           'lang=' || lang || '&v=2' AS query,
           lang AS q_lang,
           'https' AS protocol,
           'sec1' AS fragment
    FROM u
    """,
    tags=("functions", "url"),
)
def fn_url_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function surface (web-corpus pipelines live on this): assemble a
    deterministic URL per document, then take it apart with `parse_url`
    (HOST / PATH / QUERY / keyed QUERY / PROTOCOL / REF) — the JVM's
    java.net parser inside codegen, the operator a crawl-derived corpus
    uses for host-level dedup, per-domain sampling, and canonicalization.

    The oracle cannot parse URLs (no parse_url in DuckDB); it states the
    expected parts from the same construction instead — Spark must
    round-trip assemble→parse back to exactly those strings, so a parser
    quirk (dropped fragment, query-key miss, scheme case) hash-fails.
    Zero shuffle, zero Python.
    """
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2#sec1"),
    )
    part = lambda p: F.parse_url(F.col("url"), F.lit(p))  # noqa: E731
    return (
        docs.select("doc_id", url.alias("url"))
        .select(
            "doc_id",
            "url",
            part("HOST").alias("host"),
            part("PATH").alias("path"),
            part("QUERY").alias("query"),
            F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
            part("PROTOCOL").alias("protocol"),
            part("REF").alias("fragment"),
        )
    )


@query(
    "fn_xml_roundtrip",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE n_chars > 100
    """,
    tags=("functions", "xml", "roundtrip"),
)
def fn_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML codec surface (Spark 4 ``to_xml``/``from_xml``): each document's
    metadata serialized to an XML fragment and parsed back; the query
    returns the ROUNDTRIPPED values, so the oracle is the plain
    projection — any codec asymmetry (attribute ordering, type coercion,
    whitespace) breaks the hash. Same roundtrip-identity pattern as the
    CSV/JSON/ORC scan rows (sources/io.py), applied to the in-row codec
    instead of the file format. DuckDB has no XML type, which is exactly
    why the contract is shaped as a roundtrip: correctness is
    expressible without the oracle ever seeing XML."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 100
    )
    xml_struct = F.struct("doc_id", "lang", "source", "n_chars")
    schema = "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT"
    parsed = docs.select(
        F.from_xml(F.to_xml(xml_struct), schema).alias("x")
    )
    return parsed.select(
        F.col("x.doc_id").alias("doc_id"),
        F.col("x.lang").alias("lang"),
        F.col("x.source").alias("source"),
        F.col("x.n_chars").alias("n_chars"),
    )


@query(
    "fn_csv_codec_roundtrip",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE lang IS NOT NULL
    """,
    tags=("functions", "csv", "roundtrip"),
)
def fn_csv_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-row CSV codec (``to_csv``/``from_csv``) roundtrip-identity — the
    row-level sibling of the file-level scan_csv_roundtrip and the XML
    codec row: metadata serialized to a CSV line and parsed back, oracle
    = the plain projection, so quoting/escaping/type-coercion asymmetry
    breaks the hash. The codec matters operationally for message-queue
    payloads (a Kafka value is exactly one CSV/JSON/XML line — the
    env-blocked kafka.py builders use the JSON twin of this codec)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull()
    )
    line = F.to_csv(F.struct("doc_id", "lang", "n_chars"))
    schema = "doc_id BIGINT, lang STRING, n_chars BIGINT"
    parsed = docs.select(F.from_csv(line, schema).alias("c"))
    return parsed.select(
        F.col("c.doc_id").alias("doc_id"),
        F.col("c.lang").alias("lang"),
        F.col("c.n_chars").alias("n_chars"),
    )


@query(
    "fn_map_type_bundle",
    oracle="""
    SELECT event_id,
           CAST(3 AS INTEGER) AS n_keys,
           'k,type,uid' AS keys_sorted,
           event_type AS type_val,
           CAST(user_id AS VARCHAR) AS uid_val,
           CAST(json_extract(props, '$.k') AS VARCHAR) AS k_val,
           CAST(4 AS INTEGER) AS n_keys_merged
    FROM events
    WHERE event_type = 'signup'
    """,
    tags=("functions", "map"),
)
def fn_map_type_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface — the container type the array/struct/VARIANT
    bundles don't cover: build a map from columns, then size /
    map_keys / element_at / map_concat, projected back to scalars. The
    oracle never sees a map (roundtrip-identity pattern, like the
    XML/CSV codec rows): it recomputes each scalar from the base
    columns, so any asymmetry in map construction, key ordering
    (map_keys is sorted explicitly — map iteration order is undefined),
    lookup, or merge breaks the value hash. Map columns at 100 TB are
    the schema-flexible alternative to VARIANT when keys are bounded —
    all-JVM here, no UDF."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    )
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
        F.lit("k"), F.get_json_object("props", "$.k"),
    )
    merged = F.map_concat(m, F.create_map(F.lit("src"), F.lit("events")))
    return ev.select(
        "event_id",
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "type").alias("type_val"),
        F.element_at(m, "uid").alias("uid_val"),
        F.element_at(m, "k").alias("k_val"),
        F.size(merged).alias("n_keys_merged"),
    )


@query(
    "fn_lambda_bundle",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(t, x -> length(x) > 4)) AS INTEGER) AS n_long,
           CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS total_chars,
           len(list_filter(t, x -> length(x) > 8)) > 0 AS has_very_long,
           len(list_filter(t, x -> length(x) = 0)) = 0 AS all_nonempty
    FROM toks
    """,
    tags=("functions", "lambda", "higher_order"),
)
def fn_lambda_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambda functions over arrays — filter, fold
    (aggregate), exists, forall — the JVM-side row-wise compute that
    replaces per-row Python in a training pipeline (the array bundle
    covers transform/min/max; these are the predicate/fold forms).
    Spark's exists/forall are spelled in DuckDB as filtered-length
    tests, and the fold result is an exact integer sum, so every output
    is hash-comparable despite the dialects naming their lambdas
    differently. Zero shuffle, whole-stage codegen."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(F.filter(t, lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(
            t, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
        F.exists(t, lambda x: F.length(x) > 8).alias("has_very_long"),
        F.forall(t, lambda x: F.length(x) > 0).alias("all_nonempty"),
    )


@query(
    "fn_collation_bundle",
    oracle="""
    WITH mixed AS (
      SELECT lang,
             CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS mc
      FROM documents
    )
    SELECT lang,
           count(DISTINCT lower(mc)) AS n_src_ci,
           count(DISTINCT mc) AS n_src_cs,
           count(*) FILTER (lower(mc) = lower('SRC0')) AS n_eq_src0_ci,
           count(*) FILTER (contains(lower(mc), lower('C1'))) AS n_contains_c1_ci,
           count(*) FILTER (mc ILIKE 'sRc2%') AS n_ilike_src2
    FROM mixed GROUP BY lang
    """,
    tags=("functions", "collation"),
)
def fn_collation_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware string semantics (Spark 4's collation engine —
    the migration face for workloads coming from CI-collated warehouse
    columns): equality, DISTINCT, contains/startswith and ILIKE under
    ``UTF8_LCASE``, exercised against a deliberately mixed-case column
    (even doc_ids upper-cased) so case-sensitive and case-insensitive
    answers genuinely differ (n_src_ci counts half of n_src_cs).

    Cross-engine method: Spark runs the REAL collation surface
    (``collate(col, 'UTF8_LCASE')`` comparisons — which Catalyst
    evaluates with collation-aware equality all the way into hash
    aggregates); DuckDB's oracle folds with lower() — for the ASCII
    fixture domain the two definitions provably coincide, making the
    collation path value-checked rather than merely smoke-run. Scale:
    collated equality is a per-row key transform; DISTINCT under
    collation shuffles the collation key exactly like any distinct —
    no plan-shape difference vs binary strings."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    mc = F.when(
        F.col("doc_id") % 2 == 0, F.upper("source")
    ).otherwise(F.col("source"))
    mixed = docs.select("lang", mc.alias("mc"))
    ci = F.expr("collate(mc, 'UTF8_LCASE')")
    return mixed.groupBy("lang").agg(
        F.countDistinct(ci).alias("n_src_ci"),
        F.countDistinct("mc").alias("n_src_cs"),
        F.count_if(ci == "SRC0").alias("n_eq_src0_ci"),
        F.count_if(F.contains(ci, F.lit("C1"))).alias("n_contains_c1_ci"),
        F.count_if(F.col("mc").ilike("sRc2%")).alias("n_ilike_src2"),
    )


#: geohash base32 alphabet (no a/i/l/o) — public standard.
_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"
#: 15 bits per axis -> 30 bits -> 6 geohash characters; zoom-10 tiles.
_GH_BITS = 15
_TILE_Z = 1 << 10


@query(
    "fn_geo_bundle",
    oracle=f"""
    WITH pts AS (
      SELECT event_id,
             (value * 7) % 180 - 90 AS lat,
             (value * 13) % 360 - 180 AS lon
      FROM events
    ),
    quant AS (
      SELECT event_id, lat, lon,
             least(CAST(floor((lat + 90) / 180 * {1 << _GH_BITS}) AS BIGINT),
                   {(1 << _GH_BITS) - 1}) AS ilat,
             least(CAST(floor((lon + 180) / 360 * {1 << _GH_BITS}) AS BIGINT),
                   {(1 << _GH_BITS) - 1}) AS ilon
      FROM pts
    ),
    coded AS (
      SELECT event_id, lat, lon, ilat, ilon,
             list_sum(list_transform(range(0, {_GH_BITS}), k ->
               (((ilon >> k) & 1) << (2 * k + 1))
               + (((ilat >> k) & 1) << (2 * k)))) AS code
      FROM quant
    )
    SELECT event_id,
           round(lat, 6) AS lat, round(lon, 6) AS lon,
           substr('{_GH32}', CAST(((code >> 25) & 31) + 1 AS INT), 1)
           || substr('{_GH32}', CAST(((code >> 20) & 31) + 1 AS INT), 1)
           || substr('{_GH32}', CAST(((code >> 15) & 31) + 1 AS INT), 1)
           || substr('{_GH32}', CAST(((code >> 10) & 31) + 1 AS INT), 1)
           || substr('{_GH32}', CAST(((code >> 5) & 31) + 1 AS INT), 1)
           || substr('{_GH32}', CAST((code & 31) + 1 AS INT), 1) AS geohash6,
           least(CAST(floor((lon + 180) / 360 * {_TILE_Z}) AS BIGINT),
                 {_TILE_Z - 1}) AS tile_x,
           least(CAST(floor((90 - lat) / 180 * {_TILE_Z}) AS BIGINT),
                 {_TILE_Z - 1}) AS tile_y,
           lat BETWEEN 10 AND 60 AND lon BETWEEN -30 AND 60 AS in_bbox
    FROM coded
    """,
    tags=("functions", "geo"),
)
def fn_geo_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial partitioning primitives — the integer-exact subset a
    100 TB geo pipeline needs for LAYOUT (where rows go), before any
    geometry library enters: geohash encoding, tile ids, bbox predicate.
    Points derive deterministically from the events fixture (value-keyed
    pseudo-coordinates; the fixture has no lat/lon columns).

    - geohash6: NOT the textbook bisection loop — the k-th bisection bit
      of an axis IS the k-th bit of floor(normalized * 2^15), so the
      hash is one quantization + a bit-interleave fold + base32 lookup,
      all integer ops (engine-identical by construction, no trig, no
      float boundary). Interleave = Σ lon_bit<<(2k+1) | lat_bit<<(2k).
    - tile_x / tile_y: zoom-10 equirectangular tile ids (floor of the
      normalized axis × 1024, clamped) — the web-mercator x is exactly
      this; y is documented equirect (mercator y needs ln/tan — a
      transcendental whose libm rounding differs across engines, the
      same reason the haversine stays out: this bundle promises
      bit-exactness).
    - in_bbox: pure comparisons.

    All per-row scalar expressions — zero shuffle, codegen'd end to end;
    groupBy(geohash_prefix) / (tile_x, tile_y) is then an ordinary
    shuffle key, which is the entire point: spatial locality becomes
    partition locality."""
    ev = load_table(spark, sf_dir, "events", parallel=True)
    n = 1 << _GH_BITS
    pts = ev.select(
        "event_id",
        ((F.col("value") * 7) % 180 - 90).alias("lat"),
        ((F.col("value") * 13) % 360 - 180).alias("lon"),
    )
    quant = pts.select(
        "event_id",
        "lat",
        "lon",
        F.least(
            F.floor((F.col("lat") + 90) / 180 * n).cast("long"), F.lit(n - 1)
        ).alias("ilat"),
        F.least(
            F.floor((F.col("lon") + 180) / 360 * n).cast("long"), F.lit(n - 1)
        ).alias("ilon"),
    )
    coded = quant.withColumn(
        "code",
        F.expr(
            f"aggregate(sequence(0, {_GH_BITS - 1}), CAST(0 AS BIGINT), "
            "(acc, k) -> acc + shiftleft((shiftright(ilon, k) & 1), 2 * k + 1) "
            "+ shiftleft((shiftright(ilat, k) & 1), 2 * k))"
        ),
    )
    gh = F.concat(
        *[
            F.substring(
                F.lit(_GH32),
                (F.shiftright("code", s).bitwiseAND(31) + 1).cast("int"),
                1,
            )
            for s in (25, 20, 15, 10, 5, 0)
        ]
    )
    return coded.select(
        "event_id",
        F.round("lat", 6).alias("lat"),
        F.round("lon", 6).alias("lon"),
        gh.alias("geohash6"),
        F.least(
            F.floor((F.col("lon") + 180) / 360 * _TILE_Z).cast("long"),
            F.lit(_TILE_Z - 1),
        ).alias("tile_x"),
        F.least(
            F.floor((90 - F.col("lat")) / 180 * _TILE_Z).cast("long"),
            F.lit(_TILE_Z - 1),
        ).alias("tile_y"),
        (
            F.col("lat").between(10, 60) & F.col("lon").between(-30, 60)
        ).alias("in_bbox"),
    )


@query(
    "fn_busday_bundle",
    oracle="""
    WITH d AS (
      SELECT o_orderkey,
             CAST(o_orderdate AS DATE) AS od,
             (dayofweek(CAST(o_orderdate AS DATE)) + 6) % 7 AS dow
      FROM orders
    ),
    e AS (
      SELECT o_orderkey, od, dow,
             CASE WHEN dow = 5 THEN od + 2
                  WHEN dow = 6 THEN od + 1
                  ELSE od END AS eff,
             CASE WHEN dow = 5 THEN 0
                  WHEN dow = 6 THEN 0
                  ELSE dow END AS eff_dow
      FROM d
    )
    SELECT o_orderkey, CAST(od AS TIMESTAMP) AS order_date,
           dow IN (5, 6) AS is_weekend,
           CAST(eff AS TIMESTAMP) AS next_business_day,
           CAST(eff + 5 + 2 * CAST(floor((eff_dow + 5) / 5.0) AS INTEGER)
                AS TIMESTAMP) AS deadline_5bd,
           CAST(last_day(od) AS TIMESTAMP) AS month_end,
           CAST(quarter(od) AS INTEGER) AS qtr
    FROM e
    """,
    tags=("functions", "datetime"),
)
def fn_busday_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day calendar arithmetic — the settlement-date math every
    finance/ops pipeline needs (numpy busday_offset semantics, weekends
    only; holiday tables would join in as an extra broadcast):
    weekend flag, roll-forward to the next business day, and an N=5
    business-day deadline via the closed form eff + n + 2·floor((dow_eff
    + n)/5) — pure integer day arithmetic on a Monday=0 index, no
    calendar iteration, identical in both engines (each engine's
    day-of-week convention is normalized to Monday=0 first: Spark
    dayofweek is Sun=1, DuckDB's is Sun=0). Roll-forward applies
    BEFORE counting (a weekend start consumes no business days) —
    numpy's 'forward' roll. last_day/quarter ride along as the
    calendar edges. All map-side scalar expressions — zero shuffle,
    codegen'd."""
    o = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    dow = busday_dow(od)
    # DATE-typed outputs are cast to TIMESTAMP on both sides: the gate's
    # canonicalizer normalizes pd.Timestamp cells but passes datetime.date
    # through raw, and Spark→pandas yields date objects where DuckDB
    # yields datetime64 — a pure type-repr mismatch this cast removes.
    return o.select(
        "o_orderkey",
        od.cast("timestamp").alias("order_date"),
        dow.isin(5, 6).alias("is_weekend"),
        busday_roll(od).cast("timestamp").alias("next_business_day"),
        busday_offset(od, 5).cast("timestamp").alias("deadline_5bd"),
        F.last_day(od).cast("timestamp").alias("month_end"),
        F.quarter(od).alias("qtr"),
    )


def busday_dow(d):
    """Day-of-week on a Monday=0 .. Sunday=6 index (normalizes Spark's
    Sunday=1 convention)."""
    return (F.dayofweek(d) + 5) % 7


def busday_roll(d):
    """Library primitive: roll a date column forward to the next
    business day (numpy busday 'forward' roll; weekends only — join a
    holiday dimension upstream for market calendars)."""
    dow = busday_dow(d)
    return (
        F.when(dow == 5, F.date_add(d, 2))
        .when(dow == 6, F.date_add(d, 1))
        .otherwise(d)
    )


def busday_offset(d, n: int):
    """Library primitive: add ``n`` business days to a date column via
    the closed form eff + n + 2·floor((dow_eff + n)/5) — pure integer
    day arithmetic, no calendar iteration. Weekend starts roll forward
    FIRST and consume no business days (numpy busday_offset semantics).
    Verified against literal day-walking in tests."""
    dow = busday_dow(d)
    eff = busday_roll(d)
    eff_dow = F.when((dow == 5) | (dow == 6), 0).otherwise(dow)
    return F.date_add(
        eff,
        (F.lit(n) + 2 * F.floor((eff_dow + n) / 5.0).cast("int")).cast("int"),
    )


# --- Deterministic name-based UUID (RFC 4122 v3 layout) -------------------------

#: Shared scalar expression (valid in BOTH engines' SQL dialects): md5 hex
#: reshaped to 8-4-4-4-12 with the version nibble forced to '3' (md5
#: name-based) and the variant nibble to (d & 0x3) | 0x8 via a 16→4 CASE
#: fold — string ops only, no bit intrinsics, so the two engines cannot
#: diverge.
_UUID3_EXPR = (
    "concat(substr(h, 1, 8), '-', substr(h, 9, 4), '-3', substr(h, 14, 3),"
    " '-', CASE WHEN substr(h, 17, 1) IN ('0','4','8','c') THEN '8'"
    "           WHEN substr(h, 17, 1) IN ('1','5','9','d') THEN '9'"
    "           WHEN substr(h, 17, 1) IN ('2','6','a','e') THEN 'a'"
    "           ELSE 'b' END,"
    " substr(h, 18, 3), '-', substr(h, 21, 12))"
)


@query(
    "fn_uuid_deterministic",
    oracle=f"""
    WITH x AS (
      SELECT doc_id,
             md5(concat(source, ':', CAST(doc_id AS STRING))) AS h
      FROM documents
    )
    SELECT doc_id, {_UUID3_EXPR} AS doc_uuid FROM x
    """,
    tags=("function", "hash"),
)
def fn_uuid_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-derived stable row identity: RFC 4122 version-3 (md5
    name-based) UUIDs from (source, doc_id) — what a 100 TB ingest uses
    instead of uuid4()/monotonically_increasing_id so that re-runs,
    retries and cross-cluster loads mint the SAME id (idempotent sinks,
    joinable lineage). Pure map-side string surgery on the md5 hex —
    zero shuffle, whole-stage codegen — and the expression text itself
    is shared verbatim with the oracle, so the parity check certifies
    the id scheme is engine-portable."""
    docs = load_table(spark, sf_dir, "documents")
    x = docs.select(
        "doc_id",
        F.md5(
            F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"))
        ).alias("h"),
    )
    return x.select("doc_id", F.expr(_UUID3_EXPR).alias("doc_uuid"))


@query(
    "fn_isoweek_bundle",
    oracle="""
    SELECT o_orderkey,
           weekofyear(CAST(o_orderdate AS TIMESTAMP)) AS iso_week,
           isodow(CAST(o_orderdate AS TIMESTAMP)) AS iso_dow,
           isoyear(CAST(o_orderdate AS TIMESTAMP)) AS iso_year,
           CASE WHEN isodow(CAST(o_orderdate AS TIMESTAMP)) >= 6
                THEN 1 ELSE 0 END AS is_weekend
    FROM orders WHERE o_orderkey % 20 = 0
    """,
    tags=("function", "datetime"),
)
def fn_isoweek_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 calendar bundle — the reporting-calendar trio every
    weekly rollup migration trips over: ISO week number (both engines'
    weekofyear IS ISO — verified at the year boundary where 1995-01-01
    lands in week 52 of ISO-year 1994), ISO day-of-week (Monday=1;
    Spark's default dayofweek is Sunday=1, so the bundle pins the
    EXTRACT(DAYOFWEEK_ISO) spelling), and ISO YEAR, which Spark lacks —
    derived via the Thursday rule: the ISO year of a date is the
    calendar year of (date + (4 − isodow)) days, a pure arithmetic
    rewrite that ships in the docstring as the migration recipe.
    Map-side, codegen'd, keyed filter pushed to the scan."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 20 == 0
    )
    isodow = F.expr("extract(DAYOFWEEK_ISO FROM o_orderdate)").cast("long")
    iso_year = F.year(
        F.date_add(F.col("o_orderdate").cast("date"), (F.lit(4) - isodow).cast("int"))
    ).cast("long")
    return o.select(
        "o_orderkey",
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        isodow.alias("iso_dow"),
        iso_year.alias("iso_year"),
        F.when(isodow >= 6, 1).otherwise(0).alias("is_weekend"),
    )


@query(
    "fn_strsim_bundle",
    oracle="""
    WITH pairs AS (
      SELECT a.p_partkey AS k, a.p_name AS s1, b.p_name AS s2
      FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
    ),
    bi AS (
      SELECT k, s1, s2,
             list_distinct(list_transform(range(1, length(s1)),
               i -> substr(s1, i, 2))) AS b1,
             list_distinct(list_transform(range(1, length(s2)),
               i -> substr(s2, i, 2))) AS b2
      FROM pairs
    )
    SELECT k, levenshtein(s1, s2) AS lev,
           round(1.0 - levenshtein(s1, s2)
                 / CAST(greatest(length(s1), length(s2)) AS DOUBLE), 6)
             AS lev_sim,
           round(len(list_filter(b1, x -> list_contains(b2, x)))
                 / CAST(len(b1) + len(b2)
                        - len(list_filter(b1, x -> list_contains(b2, x)))
                        AS DOUBLE), 6) AS bigram_jaccard
    FROM bi
    """,
    tags=("function", "similarity"),
)
def fn_strsim_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-similarity bundle over adjacent part-name pairs: raw
    Levenshtein (both engines implement the same Wagner–Fischer
    distance — integer, no drift), length-normalized edit similarity,
    and character-bigram Jaccard built from array primitives (NOT an
    engine-specific jaccard() builtin, whose tokenization differs per
    engine — the manual distinct-bigram form is the portable one).
    This is the fuzzy-matching toolkit record linkage uses after a
    blocking join; here the equi-join on partkey+1 is the stand-in for
    any blocked candidate pair stream, which is exactly how
    llm_spell_candidates and llm_dedup_edit_verify consume these
    functions at scale."""
    p1 = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"), F.col("p_name").alias("s1")
    )
    p2 = load_table(spark, sf_dir, "part").select(
        (F.col("p_partkey") - 1).alias("k"), F.col("p_name").alias("s2")
    )
    pairs = p1.join(p2, "k")
    bigrams = lambda c: F.array_distinct(  # noqa: E731
        F.expr(
            f"transform(sequence(1, length({c}) - 1), i -> substr({c}, i, 2))"
        )
    )
    b1, b2 = bigrams("s1"), bigrams("s2")
    inter = F.size(F.array_intersect(b1, b2))
    uni = F.size(b1) + F.size(b2) - inter
    lev = F.levenshtein("s1", "s2")
    return pairs.select(
        "k",
        lev.alias("lev"),
        F.round(
            1.0 - lev / F.greatest(F.length("s1"), F.length("s2")).cast("double"), 6
        ).alias("lev_sim"),
        F.round(inter / uni.cast("double"), 6).alias("bigram_jaccard"),
    )


#: Event-type → bit position for set-membership bitmasks (stable order).
EVENT_TYPE_BITS = {"click": 1, "error": 2, "purchase": 4, "signup": 8, "view": 16}


@query(
    "fn_ipv4_bundle",
    oracle="""
    WITH ip AS (
      SELECT user_id,
             (user_id * 2654435761) % 4294967296 AS addr
      FROM (SELECT DISTINCT user_id FROM events)
    )
    SELECT user_id, addr,
           concat(CAST(addr // 16777216 AS STRING), '.',
                  CAST((addr // 65536) % 256 AS STRING), '.',
                  CAST((addr // 256) % 256 AS STRING), '.',
                  CAST(addr % 256 AS STRING)) AS dotted,
           addr // 65536 AS prefix16,
           CASE WHEN addr // 16777216 = 10
                  OR (addr // 16777216 = 172
                      AND (addr // 65536) % 256 BETWEEN 16 AND 31)
                  OR (addr // 16777216 = 192 AND (addr // 65536) % 256 = 168)
                THEN 1 ELSE 0 END AS is_private
    FROM ip
    """,
    tags=("function", "network"),
)
def fn_ipv4_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 arithmetic bundle — the log-analytics toolkit: uint32 ↔
    dotted-quad rendering, /16 prefix extraction (the CIDR-block
    grouping key for rate limiting and geo rollups), RFC 1918
    private-range classification. Addresses derive from user_id by a
    Knuth multiplicative hash REDUCED WITH EXPLICIT % 2^32 — never an
    engine hash() builtin (implementations differ) — so every byte of
    the pipeline is plain integer div/mod both engines compute
    identically. Zero shuffle beyond the distinct; all expressions
    codegen'd. The /16 groupBy that would follow in production is the
    shuffle-key lesson: group on the integer prefix, not the dotted
    string."""
    ev = load_table(spark, sf_dir, "events")
    ip = ev.select("user_id").distinct().select(
        "user_id",
        ((F.col("user_id") * 2654435761) % 4294967296).alias("addr"),
    )
    o1 = F.expr("addr div 16777216")
    o2 = F.expr("(addr div 65536) % 256")
    o3 = F.expr("(addr div 256) % 256")
    o4 = F.col("addr") % 256
    return ip.select(
        "user_id",
        "addr",
        F.concat_ws(
            ".",
            o1.cast("string"),
            o2.cast("string"),
            o3.cast("string"),
            o4.cast("string"),
        ).alias("dotted"),
        F.expr("addr div 65536").alias("prefix16"),
        F.when(
            (o1 == 10)
            | ((o1 == 172) & o2.between(16, 31))
            | ((o1 == 192) & (o2 == 168)),
            1,
        )
        .otherwise(0)
        .alias("is_private"),
    )


@query(
    "fn_binary_codec_bundle",
    oracle="""
    WITH x AS (
      SELECT doc_id, md5(concat(source, ':', CAST(doc_id AS STRING))) AS h
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT doc_id, h,
           base64(unhex(h)) AS b64,
           hex(unhex(h)) AS hex_upper,
           octet_length(unhex(h)) AS n_bytes,
           hex(from_base64(base64(unhex(h)))) AS roundtrip_hex
    FROM x
    """,
    tags=("function", "codec"),
)
def fn_binary_codec_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec bundle: hex ↔ bytes ↔ base64 conversions over md5
    digests — the encoding plumbing every payload-bearing pipeline
    (webhook signatures, content-addressed blobs, mm_* binary keys)
    crosses engines with. Pinned conventions the parity check certifies:
    md5() renders LOWERCASE hex in both engines, hex() renders
    UPPERCASE in both, base64 is unpadded-identical RFC 4648, and the
    full string→bytes→base64→bytes→hex round trip is the identity (a
    single disagreement anywhere in the chain breaks the hash). Pure
    map-side, zero shuffle."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    x = docs.select(
        "doc_id",
        F.md5(
            F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"))
        ).alias("h"),
    )
    blob = F.unhex(F.col("h"))
    return x.select(
        "doc_id",
        "h",
        F.base64(blob).alias("b64"),
        F.hex(blob).alias("hex_upper"),
        F.octet_length(blob).cast("long").alias("n_bytes"),
        F.hex(F.unbase64(F.base64(blob))).alias("roundtrip_hex"),
    )


@query(
    "fn_duration_format",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(max(CAST(ts AS TIMESTAMP)))
               - epoch_us(min(CAST(ts AS TIMESTAMP))) AS span_us
      FROM events GROUP BY user_id
    )
    SELECT user_id, span_us,
           concat('P', CAST(span_us // 86400000000 AS STRING), 'DT',
                  CAST((span_us // 3600000000) % 24 AS STRING), 'H',
                  CAST((span_us // 60000000) % 60 AS STRING), 'M',
                  CAST((span_us // 1000000) % 60 AS STRING), 'S')
             AS iso_duration,
           CAST(span_us // 3600000000 AS BIGINT) AS full_hours
    FROM g
    """,
    tags=("function", "datetime"),
)
def fn_duration_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 duration rendering (PnDTnHnMnS) of each user's activity
    span — the report-facing face of duration arithmetic, built from
    integer div/mod on epoch micros and string concat ONLY (each
    engine's native interval→string rendering differs in normalization
    and is exactly what this avoids). Also the worked example for the
    house duration rule: carry durations as integer micros end-to-end,
    render once at the edge. One partial-agg groupBy, map-side
    formatting."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("user_id").agg(
        (
            F.max(F.unix_micros(F.col("ts")))
            - F.min(F.unix_micros(F.col("ts")))
        ).alias("span_us")
    )
    return g.select(
        "user_id",
        "span_us",
        F.concat(
            F.lit("P"),
            F.expr("span_us div 86400000000").cast("string"),
            F.lit("DT"),
            F.expr("(span_us div 3600000000) % 24").cast("string"),
            F.lit("H"),
            F.expr("(span_us div 60000000) % 60").cast("string"),
            F.lit("M"),
            F.expr("(span_us div 1000000) % 60").cast("string"),
            F.lit("S"),
        ).alias("iso_duration"),
        F.expr("span_us div 3600000000").cast("long").alias("full_hours"),
    )


@query(
    "fn_luhn_checksum",
    oracle="""
    WITH x AS (
      SELECT o_orderkey, CAST(o_orderkey AS STRING) AS digits
      FROM orders WHERE o_orderkey % 25 = 0
    ),
    scored AS (
      SELECT o_orderkey, digits,
             CAST(list_sum(list_transform(
               range(1, length(digits) + 1),
               i -> CASE WHEN i % 2 = 1
                    THEN CAST(substr(reverse(digits), i, 1) AS BIGINT)
                    ELSE CASE
                      WHEN 2 * CAST(substr(reverse(digits), i, 1) AS BIGINT) > 9
                      THEN 2 * CAST(substr(reverse(digits), i, 1) AS BIGINT) - 9
                      ELSE 2 * CAST(substr(reverse(digits), i, 1) AS BIGINT)
                    END END)) AS BIGINT) AS luhn_sum
      FROM x
    )
    SELECT o_orderkey, digits, luhn_sum,
           CASE WHEN luhn_sum % 10 = 0 THEN 1 ELSE 0 END AS luhn_valid,
           (10 - (luhn_sum * 9) % 10) % 10 AS check_digit
    FROM scored
    """,
    tags=("function", "checksum"),
)
def fn_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn mod-10 checksum (ISO/IEC 7812 — card numbers, IMEIs) over
    numeric id strings: validation flag + the check digit that WOULD
    make the number valid — the ingest-validation scalar a payments
    pipeline applies at the door. Pure per-row array arithmetic
    (reverse, positional double-every-second, >9 → −9 fold) expressed
    with in-row transforms in BOTH engines — no UDF, no shuffle; the
    check-digit identity (10 − 9·sum mod 10) mod 10 avoids
    recomputing the sum with a shifted parity. The keyed filter pushes
    to the scan."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 25 == 0
    )
    x = o.select(
        "o_orderkey", F.col("o_orderkey").cast("string").alias("digits")
    )
    luhn_sum = F.expr(
        "aggregate(transform(sequence(1, length(digits)),"
        " i -> CASE WHEN i % 2 = 1"
        "  THEN CAST(substr(reverse(digits), i, 1) AS BIGINT)"
        "  ELSE CASE"
        "    WHEN 2 * CAST(substr(reverse(digits), i, 1) AS BIGINT) > 9"
        "    THEN 2 * CAST(substr(reverse(digits), i, 1) AS BIGINT) - 9"
        "    ELSE 2 * CAST(substr(reverse(digits), i, 1) AS BIGINT)"
        "  END END), CAST(0 AS BIGINT), (acc, d) -> acc + d)"
    )
    scored = x.withColumn("luhn_sum", luhn_sum)
    return scored.select(
        "o_orderkey",
        "digits",
        "luhn_sum",
        F.when(F.col("luhn_sum") % 10 == 0, 1).otherwise(0).alias(
            "luhn_valid"
        ),
        ((10 - (F.col("luhn_sum") * 9) % 10) % 10).alias("check_digit"),
    )
