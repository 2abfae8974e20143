"""Scalar-function queries (SURVEY.md §2.2 "Scalar functions").

Row-level expressions stay inside whole-stage codegen (no Python).
Dialect care vs the DuckDB oracle, learned by probing:
- DuckDB regexp_replace needs the 'g' flag to match Spark's
  replace-all default;
- transcendentals (exp/ln/pow) are libm-dependent → rounded to 6
  decimals on both sides; sqrt is IEEE-exact so left raw;
- double→string formatting diverges for |x| ≥ 1e7 (Spark "1.0E7") →
  casts to string go through decimal or small-magnitude doubles only;
- Spark floor/ceil return BIGINT → oracle casts to match;
- DuckDB EXTRACT returns BIGINT → both sides cast to INT;
- element_at / list indexing is 1-based in BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_rc_spark.registry import register
from flink_rc_spark.sources import load


@register(
    "q_str_funcs",
    oracle="""
        SELECT p_partkey,
               UPPER(p_name) AS name_upper,
               LOWER(p_brand) AS brand_lower,
               TRIM(p_type) AS type_trim,
               SUBSTRING(p_name, 1, 5) AS name_head,
               LENGTH(p_name) AS name_len,
               CONCAT(p_brand, ':', p_type) AS brand_type,
               LPAD(p_brand, 12, '*') AS brand_pad,
               REPLACE(p_type, 'a', '#') AS type_repl,
               STRING_SPLIT(p_name, ' ')[1] AS first_word
        FROM part
    """,
)
def q_str_funcs(spark, sf_dir):
    """upper/lower/trim/substr/length/concat/lpad/replace/split."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim("p_type").alias("type_trim"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.replace(F.col("p_type"), F.lit("a"), F.lit("#")).alias("type_repl"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
    )


@register(
    "q_str_regex",
    oracle="""
        SELECT p_partkey,
               REGEXP_EXTRACT(p_name, '([a-z]+)$', 1) AS last_word,
               REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled,
               REGEXP_MATCHES(p_name, '^[a-m]') AS starts_first_half
        FROM part
    """,
)
def q_str_regex(spark, sf_dir):
    """regexp_extract / regexp_replace / rlike (Spark replaces all
    matches by default — oracle passes the 'g' flag to match)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("^[a-m]").alias("starts_first_half"),
    )


@register(
    "q_date_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mo,
               CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS dy,
               DATE_TRUNC('month', o_orderdate) AS month_start,
               o_orderdate + INTERVAL 30 DAY AS due_date,
               CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01', o_orderdate)
                    AS INTEGER) AS days_since_1995
        FROM orders
    """,
)
def q_date_funcs(spark, sf_dir):
    """year/month/day extraction, date_trunc, interval arithmetic,
    day difference from an epoch."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("days_since_1995"),
    )


@register(
    "q_math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ABS(l_discount - 0.05) AS abs_c,
               ROUND(l_extendedprice, -2) AS price_round_100,
               CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
               CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
               SQRT(l_quantity) AS qty_sqrt,
               ROUND(EXP(l_discount), 6) AS exp_disc,
               ROUND(LN(l_extendedprice), 6) AS ln_price,
               ROUND(LOG10(l_extendedprice), 6) AS log10_price,
               POW(l_quantity, 2) AS qty_sq,
               MOD(l_linenumber, 3) AS ln_mod3,
               CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sign_c
        FROM lineitem
        WHERE l_orderkey <= 2000
    """,
)
def q_math_funcs(spark, sf_dir):
    """abs/round/floor/ceil/sqrt/exp/ln/log10/pow/mod/sign.

    sqrt & pow(int,2) are IEEE-exact; exp/ln/log10 rounded to 6
    (libm last-ulp differences between JVM and C).
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_c"),
        F.round("l_extendedprice", -2).alias("price_round_100"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        (F.col("l_linenumber") % 3).alias("ln_mod3"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_c"),
    )


@register(
    "q_case_null",
    oracle="""
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                    WHEN c_acctbal < 1000 THEN 'low'
                    ELSE 'healthy' END AS bal_bucket,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'hidden') AS seg_masked,
               IFNULL(NULLIF(c_name, c_name), 'anon') AS always_anon
        FROM customer
    """,
)
def q_case_null(spark, sf_dir):
    """CASE WHEN / coalesce / nullif / ifnull."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 1000, "low")
        .otherwise("healthy")
        .alias("bal_bucket"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("hidden")
        ).alias("seg_masked"),
        F.ifnull(F.nullif(F.col("c_name"), F.col("c_name")), F.lit("anon")).alias(
            "always_anon"
        ),
    )


@register(
    "q_cast",
    oracle="""
        SELECT l_orderkey,
               l_linenumber,
               CAST(l_linenumber AS DOUBLE) AS linenumber_dbl,
               CAST(l_orderkey AS VARCHAR) AS orderkey_str,
               CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS qty_dec,
               CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR) AS qty_str,
               CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day_str,
               CAST('2024-06-01 12:00:00' AS TIMESTAMP) AS const_ts,
               CAST(CAST(l_linenumber AS DECIMAL(10,3)) AS DOUBLE) AS linenumber_dec
        FROM lineitem
        WHERE l_orderkey <= 2000
    """,
)
def q_cast(spark, sf_dir):
    """Casts across int/double/string/timestamp/decimal (string
    renderings routed through decimal/date so both engines format
    identically).

    Output-boundary policy (functions/exact.py): no raw DECIMAL output
    columns — Spark's Decimal('37.00') and a client's 37.0 stringify
    differently under hash canonicalization even when values compare
    equal (driver r1 hash-fail). The decimal *casts* stay under test;
    the emitted columns are DOUBLE (value path) and VARCHAR (rendering
    path, qty_str) on both engines.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    qty_dec = F.col("l_quantity").cast("decimal(12,2)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_linenumber").cast("double").alias("linenumber_dbl"),
        F.col("l_orderkey").cast("string").alias("orderkey_str"),
        qty_dec.cast("double").alias("qty_dec"),
        qty_dec.cast("string").alias("qty_str"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_day_str"),
        F.lit("2024-06-01 12:00:00").cast("timestamp").alias("const_ts"),
        F.col("l_linenumber").cast("decimal(10,3)").cast("double").alias(
            "linenumber_dec"
        ),
    )


@register(
    "q_bit_funcs",
    oracle="""
        SELECT l_orderkey,
               l_linenumber,
               l_linenumber & 5 AS b_and,
               l_linenumber | 8 AS b_or,
               xor(l_linenumber, 3) AS b_xor,
               CAST(l_linenumber << 2 AS INTEGER) AS b_shl,
               CAST(l_linenumber >> 1 AS INTEGER) AS b_shr,
               CAST(bit_count(CAST(l_orderkey AS BIGINT)) AS INTEGER) AS key_bits
        FROM lineitem
        WHERE l_orderkey <= 2000
        """,
)
def q_bit_funcs(spark, sf_dir):
    """Bitwise scalar surface: and/or/xor, shifts, popcount.

    Integer-exact in both engines (no float anywhere). Spark's `^` on
    Columns is XOR (bitwiseXOR), DuckDB spells it xor(); shifts via
    shiftleft/shiftright. Pure codegen'd row maps — scan-bound at any
    scale."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    ln = F.col("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ln.bitwiseAND(F.lit(5)).alias("b_and"),
        ln.bitwiseOR(F.lit(8)).alias("b_or"),
        ln.bitwiseXOR(F.lit(3)).alias("b_xor"),
        F.shiftleft(ln, 2).alias("b_shl"),
        F.shiftright(ln, 1).alias("b_shr"),
        F.bit_count(F.col("l_orderkey").cast("bigint")).cast("int").alias("key_bits"),
    )


@register(
    "q_agg_bitwise",
    oracle="""
        SELECT l_returnflag,
               bit_and(l_linenumber) AS all_bits,
               bit_or(l_linenumber) AS any_bits,
               bit_xor(l_linenumber) AS parity_bits
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """,
)
def q_agg_bitwise(spark, sf_dir):
    """Bitwise aggregates (bit_and / bit_or / bit_xor) per group —
    integer-exact, order-independent by algebra, so no decimal routing
    is needed. Map-side partial aggregation reduces each partition to
    three ints per group before the shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bit_and("l_linenumber").alias("all_bits"),
            F.bit_or("l_linenumber").alias("any_bits"),
            F.bit_xor("l_linenumber").alias("parity_bits"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_array_funcs",
    oracle="""
        SELECT vec_id,
               LEN(embedding) AS n_dims,
               embedding[1] AS first_dim,
               embedding[64] AS last_dim,
               LIST_MIN(embedding) AS min_dim,
               LIST_MAX(embedding) AS max_dim,
               LIST_CONTAINS(embedding, 0.0) AS has_zero
        FROM embeddings
    """,
)
def q_array_funcs(spark, sf_dir):
    """size / element_at / array_min / array_max / array_contains on the
    embedding vector column (pass-through float32 values — exact)."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.element_at("embedding", 1).alias("first_dim"),
        F.element_at("embedding", 64).alias("last_dim"),
        F.array_min("embedding").alias("min_dim"),
        F.array_max("embedding").alias("max_dim"),
        F.array_contains("embedding", F.lit(0.0).cast("float")).alias("has_zero"),
    )


@register(
    "q_explode",
    oracle="""
        SELECT vec_id, UNNEST(embedding) AS dim_value
        FROM embeddings
        WHERE vec_id < 50
    """,
)
def q_explode(spark, sf_dir):
    """explode/unnest of the embedding array (64 rows per vector)."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return e.select("vec_id", F.explode("embedding").alias("dim_value"))


@register(
    "q_json_funcs",
    oracle="""
        SELECT event_id,
               JSON_EXTRACT_STRING(props, '$.k') AS k_str,
               CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) AS k_int,
               JSON_EXTRACT_STRING(props, '$.missing') AS missing_key
        FROM events
    """,
)
def q_json_funcs(spark, sf_dir):
    """JSON extraction from the events.props string column."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_key"),
    )


@register(
    "q_hash_funcs",
    oracle="""
        SELECT doc_id,
               MD5(text) AS text_md5,
               SHA256(text) AS text_sha256
        FROM documents
    """,
)
def q_hash_funcs(spark, sf_dir):
    """md5 / sha-256 content hashes (the exact-dedup primitive)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@register(
    "q_map_funcs",
    oracle="""
        WITH m AS (
            SELECT event_id,
                   MAP(['ev', 'cents'],
                       [event_id % 100, CAST(floor(value * 100) AS BIGINT)])
                       AS mp
            FROM events
        )
        SELECT event_id,
               mp['ev'][1] AS ev_mod,
               mp['cents'][1] AS cents,
               mp['absent'][1] AS missing_key,
               CAST(cardinality(mp) AS INT) AS n_entries,
               map_keys(mp) AS ks,
               list_transform(map_values(mp), v -> v * 2) AS doubled
        FROM m
        ORDER BY event_id
    """,
)
def q_map_funcs(spark, sf_dir):
    """MapType surface: construction (map_from_arrays), lookup
    (element_at — NULL on a missing key in both engines), cardinality,
    key/value extraction, and a value-side transform.

    Dialect notes pinned by the oracle: DuckDB map extraction yields a
    LIST (``mp['k'][1]`` for the scalar Spark's ``element_at``
    returns), and DuckDB has no transform_values — the oracle rebuilds
    the semantics with list_transform over map_values. Entry order is
    construction order in both engines, so the ks/doubled arrays
    hash-match. Scale: pure per-row JVM expressions, no shuffle.
    """
    e = load(spark, sf_dir, "events")
    mp = F.map_from_arrays(
        F.array(F.lit("ev"), F.lit("cents")),
        F.array(
            F.col("event_id") % 100,
            F.floor(F.col("value") * 100).cast("bigint"),
        ),
    )
    m = e.select("event_id", mp.alias("mp"))
    return m.select(
        "event_id",
        F.element_at("mp", F.lit("ev")).alias("ev_mod"),
        F.element_at("mp", F.lit("cents")).alias("cents"),
        F.element_at("mp", F.lit("absent")).alias("missing_key"),
        F.size("mp").alias("n_entries"),
        F.map_keys("mp").alias("ks"),
        F.expr("transform(map_values(mp), v -> v * 2)").alias("doubled"),
    ).orderBy("event_id")


@register(
    "q_posexplode",
    oracle="""
        SELECT doc_id, u.pos AS pos, u.tok AS tok
        FROM (
            SELECT doc_id,
                   unnest(list_transform(range(len(string_split(text, ' '))),
                          i -> {'pos': i, 'tok': string_split(text, ' ')[i+1]}))
                       AS u
            FROM documents
            WHERE doc_id < 50
        )
        ORDER BY doc_id, pos
    """,
    tags=("scalar", "generator"),
)
def q_posexplode(spark, sf_dir):
    """posexplode: the ordinal-preserving generator (UDTF shape) —
    token position survives the flattening, which plain explode
    (q_explode) discards. Positions are 0-based in both spellings
    (Spark posexplode natively; the oracle builds (pos, tok) structs
    from range() since DuckDB's UNNEST carries no ordinality)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).orderBy("doc_id", "pos")


# ---------------------------------------------------------------------------
# q_variant_funcs — Spark 4 VARIANT (semi-structured) surface
# ---------------------------------------------------------------------------


@register(
    "q_variant_funcs",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(SUM(CASE WHEN CAST(props->>'$.k' AS BIGINT) > 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
               CAST(COUNT(*) AS BIGINT) AS n_missing,
               'OBJECT<k: BIGINT, t: STRING>' AS sch
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("scalar", "json", "variant"),
)
def q_variant_funcs(spark, sf_dir):
    """Spark 4 VARIANT surface — the open-format semi-structured type
    (binary-encoded, path-indexed) that replaces string-JSON
    re-parsing in hot paths: each event's props JSON plus its
    event_type are folded into ONE variant via parse_json, then read
    back with typed paths — variant_get (hard cast), try_variant_get
    (NULL on missing path — counted, proving NULL semantics), and
    schema_of_variant (the derived OBJECT<...> shape, asserted
    row-uniform via min ≡ group constant).

    The oracle reads the same numbers straight from the source JSON
    (DuckDB's ->> path operator): the hash therefore proves the
    string→variant→typed-path round trip is lossless. 100 TB: VARIANT
    is columnar-shredded in Parquet (Spark 4 variant shredding), so
    `$.k` reads don't re-parse the document — the scan stays
    pushdown-friendly exactly like the rest of the relational
    surface; the aggregate is an ordinary 5-group hash agg.
    """
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        # try_parse_json, not parse_json: get_json_object strips the
        # quotes off a JSON-string k, so a non-numeric k would make
        # the concat'd document malformed — try_ degrades that row to
        # a NULL variant instead of failing the whole query. (The
        # fixture's k is always numeric, so the hash is unchanged.)
        F.expr(
            "try_parse_json(concat('{\"k\": ', get_json_object(props, '$.k'),"
            " ', \"t\": \"', event_type, '\"}'))"
        ).alias("v"),
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
        F.expr("variant_get(v, '$.t', 'string')").alias("t"),
        F.expr("try_variant_get(v, '$.absent', 'bigint')").alias("missing"),
        F.expr("schema_of_variant(v)").alias("sch"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0))
            .cast("bigint")
            .alias("n_big"),
            F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_missing"),
            F.min("sch").alias("sch"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q_sql_udf — Spark 4 SQL-defined functions (CREATE FUNCTION ... RETURN)
# ---------------------------------------------------------------------------


@register(
    "q_sql_udf",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(
                   CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))
                        * (1 + CAST(l_tax AS DECIMAL(12,2))) AS DOUBLE)
                   AS DECIMAL(18,6))) AS DOUBLE) AS total_charge
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("scalar", "sql", "udf"),
)
def q_sql_udf(spark, sf_dir):
    """SQL-defined scalar function (Spark 4 ``CREATE FUNCTION ...
    RETURNS ... RETURN expr``) — the DECLARATIVE UDF: the charge
    formula is named once in SQL and inlined by Catalyst into the
    calling plan, so unlike every Python UDF shape it stays inside
    whole-stage codegen with zero serialization boundary (the reason
    a warehouse migrates hot Python UDFs to SQL UDFs first). The body
    is the decimal-exact TPC-H charge product, so the aggregate
    hash-matches the oracle's inlined spelling — proving the function
    call is an abstraction, not a computation change. (The TABLE
    variant, ``RETURNS TABLE``, is exercised in
    tests/test_correctness.py::test_sql_table_udf_inlines.)

    100 TB: nothing new to say — and that is the point: the plan is
    exactly q_tpch_q1's partial+final hash agg; naming the expression
    cost nothing.
    """
    from flink_rc_spark.sources.tables import load

    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION charge(
            price DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS DOUBLE
        RETURN CAST(CAST(price AS DECIMAL(12,2))
                    * (1 - CAST(disc AS DECIMAL(12,2)))
                    * (1 + CAST(tax AS DECIMAL(12,2))) AS DOUBLE)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(charge(l_extendedprice, l_discount, l_tax)
                             AS DECIMAL(18,6))) AS DOUBLE) AS total_charge
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# q_try_arith — ANSI-mode safe arithmetic (try_* family)
# ---------------------------------------------------------------------------


@register(
    "q_try_arith",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN CAST(props->>'$.k' AS BIGINT) = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_div0,
               CAST(SUM(CASE WHEN CAST(props->>'$.k' AS BIGINT) <> 0
                   THEN (CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                         * 1000) // CAST(props->>'$.k' AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS sum_ratio_milli,
               CAST(SUM(CASE WHEN TRY_CAST(event_type AS INTEGER) IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_uncastable
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("scalar", "ansi"),
)
def q_try_arith(spark, sf_dir):
    """ANSI-mode safe arithmetic: Spark 4 runs with ansi=true, where
    division by zero / overflow / bad casts are runtime ERRORS — the
    ``try_`` family is the per-expression opt-out that turns them
    into NULLs a pipeline can count and quarantine. Per event type:
    rows whose JSON k is 0 (a divide-by-zero each — try_divide yields
    NULL, counted), the integer-fixed-point sum of the valid value/k
    ratios (milli-units via exact integer division; operands are
    non-negative here, where Spark's truncating DIV and DuckDB's
    flooring // agree — per-row double ROUND diverged between engines
    in the 4th decimal on ties, the bug class the registry float
    policy exists for), and try_cast failures (every event_type string — counted
    as NULLs, proving the cast fails SOFT under ANSI).

    The q_ab_ztest lesson institutionalized: an unguarded division
    that CAN hit zero is a crash at scale; this key is the idiomatic
    guard. The oracle spells the same semantics with explicit CASE
    (DuckDB divides permissively, so its guard is the condition
    itself). 100 TB: pure row-local codegen expressions into a
    5-group agg — the try_ forms cost nothing over the raw ops.
    """
    ev = load(spark, sf_dir, "events")
    k = F.expr("CAST(get_json_object(props, '$.k') AS BIGINT)")
    ratio = F.expr(
        "try_divide(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE),"
        " CAST(get_json_object(props, '$.k') AS BIGINT))"
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.when(ratio.isNull() & (k == 0), 1).otherwise(0))
            .cast("bigint")
            .alias("n_div0"),
            F.sum(
                F.when(
                    k != 0,
                    F.expr(
                        "(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
                        " * 1000) DIV CAST(get_json_object(props, '$.k')"
                        " AS BIGINT)"
                    ),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("sum_ratio_milli"),
            F.sum(
                F.when(F.expr("try_cast(event_type AS INT)").isNull(), 1).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("n_uncastable"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q_collation — collation-aware comparison and grouping (Spark 4)
# ---------------------------------------------------------------------------


@register(
    "q_collation",
    oracle="""
        WITH mixed AS (
            SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                        ELSE event_type END AS et
            FROM events
        )
        SELECT lower(et) AS event_type_ci,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT et) AS BIGINT) AS n_case_variants
        FROM mixed
        GROUP BY lower(et)
        ORDER BY event_type_ci
    """,
    tags=("scalar", "string", "collation"),
)
def q_collation(spark, sf_dir):
    """Collation-aware grouping (Spark 4 COLLATE): event types are
    case-mangled per row (upper for even event_ids), then grouped
    under UTF8_LCASE collation — the engine-level case-insensitive
    semantics that replace scattering lower() through every
    expression (and that SQL migrations from case-insensitive
    warehouses depend on). The case-variant count proves the groups
    really merged distinct binary strings. DuckDB has no per-column
    collations in this shape, so the oracle is the lower() rewrite —
    the hash proves collation ≡ normalize-then-group.

    100 TB: collation is metadata on the comparison, not a
    projection — grouping keys hash under the collation JVM-side; no
    extra pass, same partial+final agg.
    """
    ev = load(spark, sf_dir, "events")
    mixed = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.upper("event_type"))
        .otherwise(F.col("event_type"))
        .alias("et")
    )
    ci = F.expr("et COLLATE UTF8_LCASE")
    return (
        mixed.groupBy(ci.alias("et_ci"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count_distinct(F.expr("et COLLATE UTF8_BINARY"))
            .cast("bigint")
            .alias("n_case_variants"),
        )
        .select(
            F.lower(F.col("et_ci")).alias("event_type_ci"), "n", "n_case_variants"
        )
        .orderBy("event_type_ci")
    )
