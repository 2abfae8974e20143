"""Modern-SQL surface parity: gaps-and-islands, DISTINCT ON,
GROUP BY ALL, ordered LISTAGG, null-safe join, URL parsing, and
HTML-tag stripping.

These are the day-two SQL idioms a warehouse user reaches for right
after the relational core — each declared key proves the Spark
spelling (syntax or rewrite) against the DuckDB spelling of the same
semantics.

Reference parity: none — driver-north-star SQL surface (same family
as q_pipe_syntax / q_recursive_cte / q_cte).

100 TB story: every key is scan → one hash shuffle (groupBy or
window partitioned by a high-cardinality key) → bounded output.
DISTINCT ON and gaps-islands partition by user_id (parallel, skew
bounded by per-user volume); LISTAGG md5-digests the per-group string
so the output row stays O(1) regardless of group size; the null-safe
join operates on pre-aggregated bucket frames (broadcast-size).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_rc_spark.registry import register
from flink_rc_spark.sources.tables import load


@register(
    "q_gaps_islands",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
            FROM events
        ), grp AS (
            SELECT user_id, d,
                   date_diff('day', DATE '1970-01-01', d)
                     - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS g
            FROM days
        ), island AS (
            SELECT user_id, g, CAST(COUNT(*) AS BIGINT) AS len
            FROM grp GROUP BY user_id, g
        )
        SELECT user_id,
               CAST(SUM(len) AS BIGINT) AS n_days,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(MAX(len) AS BIGINT) AS max_island_len
        FROM island GROUP BY user_id
    """,
    tags=("sql", "window"),
)
def q_gaps_islands(spark, sf_dir):
    """Gaps-and-islands: per user, maximal runs of CONSECUTIVE active
    days — the canonical streak query (epoch_day − row_number is
    constant within a run).

    Plan: distinct (user, day) first (map-side combine collapses the
    raw events), then the row_number window partitions by user_id —
    fully parallel, per-user day count bounds each sort — and two
    grouped reduces. All integer arithmetic (epoch days), hash-exact.
    """
    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    grp = days.select(
        "user_id",
        "d",
        (
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
        ).alias("g"),
    )
    island = grp.groupBy("user_id", "g").agg(F.count("*").alias("len"))
    return island.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_days"),
        F.count("*").cast("long").alias("n_islands"),
        F.max("len").cast("long").alias("max_island_len"),
    )


@register(
    "q_distinct_on",
    oracle="""
        SELECT DISTINCT ON (user_id)
               user_id, event_id, event_type, ts
        FROM events
        ORDER BY user_id, ts DESC, event_id DESC
    """,
    tags=("sql", "window"),
)
def q_distinct_on(spark, sf_dir):
    """DISTINCT ON (latest-event-per-user): DuckDB spells it with the
    Postgres DISTINCT ON clause; Spark lacks the syntax, so the
    declared rewrite is the row_number()=1 window idiom. Tie-break
    (ts DESC, event_id DESC) makes the winner total-ordered, so both
    spellings pick the identical row.

    Plan: one window partitioned by user_id (the same hash shuffle a
    groupBy would take) with a top-1 filter — at scale AQE handles
    per-user skew; no global sort (the oracle's ORDER BY is DISTINCT
    ON's selection order, not a result order — the driver compare is
    order-insensitive).
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select("user_id", "event_id", "event_type", "ts")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@register(
    "q_groupby_all",
    oracle="""
        SELECT event_type, user_id % 3 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY ALL
    """,
    tags=("sql", "agg"),
)
def q_groupby_all(spark, sf_dir):
    """GROUP BY ALL — both engines infer the grouping key set from
    the non-aggregate select list (Spark 3.4+/DuckDB syntax parity);
    the declared key proves the inferred keys match.

    Plan: single hash aggregate, map-side combined; DECIMAL sum per
    the float policy.
    """
    ev = load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_gba_events")
    return spark.sql(
        """
        SELECT event_type, user_id % 3 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM _gba_events
        GROUP BY ALL
        """
    )


@register(
    "q_agg_listagg",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               md5(string_agg(CAST(event_id AS VARCHAR), ','
                              ORDER BY event_id)) AS ids_md5
        FROM events
        GROUP BY event_type
    """,
    tags=("sql", "agg"),
)
def q_agg_listagg(spark, sf_dir):
    """Ordered string aggregation: Spark 4's LISTAGG ... WITHIN GROUP
    (ORDER BY ...) vs DuckDB's string_agg(... ORDER BY ...). The
    deterministic ORDER BY makes the concatenation unique, and the
    md5 digest keeps the output row O(1) however large the group —
    the only scale-sane way to declare a concatenation key.

    Plan: one hash aggregate; the sort is per-group within the
    aggregate (bounded by group size, 5 groups here — for
    high-cardinality groups the digest idiom still holds).
    """
    ev = load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_listagg_events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               md5(listagg(CAST(event_id AS STRING), ',')
                   WITHIN GROUP (ORDER BY event_id)) AS ids_md5
        FROM _listagg_events
        GROUP BY event_type
        """
    )


@register(
    "q_join_nullsafe",
    oracle="""
        WITH o AS (
            SELECT NULLIF(o_custkey % 7, 0) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS o_cnt
            FROM orders GROUP BY NULLIF(o_custkey % 7, 0)
        ), c AS (
            SELECT NULLIF(c_custkey % 7, 0) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS c_cnt
            FROM customer GROUP BY NULLIF(c_custkey % 7, 0)
        )
        SELECT o.bucket AS bucket, o.o_cnt, c.c_cnt
        FROM o JOIN c ON o.bucket IS NOT DISTINCT FROM c.bucket
    """,
    tags=("sql", "join"),
)
def q_join_nullsafe(spark, sf_dir):
    """Null-safe equi-join: Spark's <=> (eqNullSafe) vs SQL's
    IS NOT DISTINCT FROM — NULL keys match each other instead of
    dropping (the semantics MERGE/dedup pipelines need for nullable
    business keys).

    Plan: both sides pre-aggregate to ≤ 8 bucket rows before the
    join, so the null-safe comparison runs on broadcast-size frames;
    at scale a null-safe join hash-partitions on a NULL-sentinel
    wrapped key exactly like a normal equi-join (Spark plans
    EqualNullSafe as a hash join key, not a cross product).
    """
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    o = orders.groupBy(
        F.nullif(F.col("o_custkey") % 7, F.lit(0)).alias("bucket")
    ).agg(F.count("*").alias("o_cnt"))
    c = customer.groupBy(
        F.nullif(F.col("c_custkey") % 7, F.lit(0)).alias("bucket")
    ).agg(F.count("*").alias("c_cnt"))
    return o.join(c, o["bucket"].eqNullSafe(c["bucket"])).select(
        o["bucket"].alias("bucket"), "o_cnt", "c_cnt"
    )


@register(
    "q_url_funcs",
    oracle="""
        SELECT doc_id,
               source || '.example.com' AS host,
               '/docs/' || CAST(doc_id AS VARCHAR) AS path,
               lang AS lang_param
        FROM documents
    """,
    tags=("sql", "functions", "llm"),
)
def q_url_funcs(spark, sf_dir):
    """URL parsing (crawl-pipeline staple): build a canonical URL per
    document and extract HOST / PATH / a QUERY parameter with Spark's
    parse_url. The oracle states the expected components directly
    from the source columns — proving parse_url inverts the
    construction exactly.

    Plan: pure per-row JVM string expressions (whole-stage codegen,
    no shuffle at all).
    """
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "q_html_strip",
    oracle="""
        SELECT doc_id,
               CAST(LENGTH(TRIM(regexp_replace(
                   regexp_replace('<html><body><h1>' || source || '</h1><p>'
                                  || text || '</p></body></html>',
                                  '<[^>]+>', ' ', 'g'),
                   '\\s+', ' ', 'g'))) AS BIGINT) AS clean_len,
               md5(TRIM(regexp_replace(
                   regexp_replace('<html><body><h1>' || source || '</h1><p>'
                                  || text || '</p></body></html>',
                                  '<[^>]+>', ' ', 'g'),
                   '\\s+', ' ', 'g'))) AS clean_md5
        FROM documents
    """,
    tags=("sql", "functions", "llm"),
)
def q_html_strip(spark, sf_dir):
    """HTML-tag stripping (web-crawl text extraction): wrap each
    document in markup, strip tags with a regex, squash whitespace,
    digest the cleaned text. Spark's regexp_replace replaces ALL
    matches by default; DuckDB needs the explicit 'g' flag — the key
    pins that the two engines' regex semantics agree on this pattern
    class (no backrefs, no lookaround — the RE2-safe subset).

    Plan: per-row JVM regex in whole-stage codegen, no shuffle; at
    100 TB this is the embarrassingly-parallel map stage of a crawl
    cleaning pipeline.
    """
    docs = load(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><body><h1>"),
        F.col("source"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    clean = F.trim(
        F.regexp_replace(F.regexp_replace(html, "<[^>]+>", " "), r"\s+", " ")
    )
    return docs.select(
        "doc_id",
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )
