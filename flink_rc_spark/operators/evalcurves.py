"""Ranking-evaluation curves: average precision, mean reciprocal rank,
and the decile lift/gains table — the metrics that grade a retrieval
system or a response model beyond a single AUC number.

Reference parity: none — the reference is a numeric dataflow engine
(SURVEY.md §1.1); this is driver-north-star analytics surface, the
same family as q_eval_ndcg / q_auc_roc.

Float policy (SURVEY.md §4.2): every curve point is an exact integer
micro-quantity (floor(1e6·p/q) on positive BIGINTs — Spark DIV
truncation ≡ DuckDB // floor for non-negative operands); the only
doubles are final reported ratios of exactly-agreed integers.

100 TB story: AP and MRR rank WITHIN a query partition (source), so
the window scales with per-query result-list length, never the
corpus. The lift table ranks the CUSTOMER DIMENSION (the q_pareto_abc
discipline — fact-sized work is one hash agg; the rank window runs
over the aggregated dimension, with the 2-pass range-partitioned
prefix sum as the documented swap past ~1e9 customers); the decile
rollup is 10 rows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_rc_spark.plans.inspect import checkpoint
from flink_rc_spark.registry import register
from flink_rc_spark.sources.tables import load


# ---------------------------------------------------------------------------
# q_eval_pr_curve — per-query average precision (AP) over ranked docs
# ---------------------------------------------------------------------------


@register(
    "q_eval_pr_curve",
    oracle="""
        WITH ranked AS (
            SELECT source,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS r
            FROM documents
        ), cum AS (
            SELECT source, rel, r,
                   CAST(SUM(rel) OVER (PARTITION BY source ORDER BY r)
                        AS BIGINT) AS tp
            FROM ranked
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(rel) AS BIGINT) AS n_rel,
               CAST(SUM(CASE WHEN rel = 1
                             THEN (tp * 1000000) // r ELSE 0 END)
                    AS BIGINT) AS ap_micro_sum,
               CASE WHEN SUM(rel) > 0 THEN
                   ROUND(CAST(SUM(CASE WHEN rel = 1
                                       THEN (tp * 1000000) // r
                                       ELSE 0 END) AS DOUBLE)
                         / (CAST(SUM(rel) AS DOUBLE) * 1000000e0), 6)
               END AS avg_precision
        FROM cum
        GROUP BY source
        ORDER BY source
    """,
    tags=("stats", "eval", "llm"),
)
def q_eval_pr_curve(spark, sf_dir):
    """Per-query AVERAGE PRECISION (the area under the precision-recall
    curve in its rank-sum form): queries are document sources, the
    ranking is n_chars-descending (the q_eval_ndcg probe ranking), and
    a document is relevant when lang='en'. AP = mean over relevant
    docs of precision-at-their-rank — the retrieval metric that, unlike
    NDCG, is threshold-free AND penalizes late recall.

    Exactness: precision at rank r is tp_r/r; each term is
    floor-quantized to 1e6 on exact BIGINTs (truncating DIV ≡ floor
    for the non-negative operands), the per-query sum is a BIGINT, and
    the reported AP is ONE double division of exactly-agreed integers.

    Plan at 100 TB: rank + cumulative-tp are two windows on the SAME
    (source) exchange; the rollup rides the same partitioning. Window
    width = per-query result-list length — corpus growth adds
    partitions, not window depth.
    """
    d = load(spark, sf_dir, "documents")
    rel = F.when(F.col("lang") == "en", 1).otherwise(0)
    w_rank = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    ranked = d.select(
        "source", rel.alias("rel"), F.row_number().over(w_rank).alias("r")
    )
    w_cum = Window.partitionBy("source").orderBy("r")
    cum = ranked.withColumn(
        "tp", F.sum("rel").over(w_cum).cast("bigint")
    )
    term = F.when(
        F.col("rel") == 1,
        F.expr("(tp * 1000000) DIV r"),
    ).otherwise(F.lit(0))
    return (
        cum.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("rel").cast("bigint").alias("n_rel"),
            F.sum(term).cast("bigint").alias("ap_micro_sum"),
        )
        .select(
            "source",
            "n_docs",
            "n_rel",
            "ap_micro_sum",
            F.when(
                F.col("n_rel") > 0,
                F.round(
                    F.col("ap_micro_sum").cast("double")
                    / (F.col("n_rel").cast("double") * F.lit(1000000.0)),
                    6,
                ),
            ).alias("avg_precision"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q_eval_mrr — mean reciprocal rank of the first relevant document
# ---------------------------------------------------------------------------


@register(
    "q_eval_mrr",
    oracle="""
        WITH ranked AS (
            SELECT source,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS r
            FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(CASE WHEN rel = 1 THEN r END) AS BIGINT)
                   AS first_rel_rank,
               CAST(COALESCE(1000000 // MIN(CASE WHEN rel = 1 THEN r END),
                             0) AS BIGINT) AS rr_micro
        FROM ranked
        GROUP BY source
        ORDER BY source
    """,
    tags=("stats", "eval", "llm"),
)
def q_eval_mrr(spark, sf_dir):
    """RECIPROCAL RANK of the first relevant document per query (the
    question-answering / known-item-search metric): same query set,
    ranking, and relevance rule as q_eval_pr_curve; rr = 1/rank of the
    first lang='en' hit, 0 when a query surfaces none. The corpus MRR
    is the mean of rr_micro/1e6 over these rows — a 1-row agg the
    consumer owns (kept per-query here so the readout shows WHICH
    query funnels are broken, the actionable half of the metric).

    Exactness: first_rel_rank is a MIN over exact ranks; rr_micro =
    1000000 DIV rank (truncation ≡ floor, positive operands). No
    doubles anywhere.

    Plan at 100 TB: ONE (source) window + the rollup on the same
    exchange — q_eval_pr_curve's subtree minus the cumulative pass.
    """
    d = load(spark, sf_dir, "documents")
    rel = F.when(F.col("lang") == "en", 1).otherwise(0)
    w_rank = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    ranked = d.select(
        "source", rel.alias("rel"), F.row_number().over(w_rank).alias("r")
    )
    first = F.min(F.when(F.col("rel") == 1, F.col("r"))).cast("bigint")
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            first.alias("first_rel_rank"),
        )
        .select(
            "source",
            "n_docs",
            "first_rel_rank",
            F.coalesce(
                F.expr("1000000 DIV first_rel_rank"), F.lit(0)
            )
            .cast("bigint")
            .alias("rr_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q_lift_curve — decile lift / cumulative gains over ranked customers
# ---------------------------------------------------------------------------


@register(
    "q_lift_curve",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                        AS BIGINT) AS spend_cents,
                   CAST(MAX(CASE WHEN o_orderpriority = '1-URGENT'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS responder
            FROM orders GROUP BY o_custkey
        ), ranked AS (
            SELECT spend_cents, responder,
                   ROW_NUMBER() OVER (ORDER BY spend_cents DESC, o_custkey)
                       AS rn,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n_cust
            FROM per_cust
        ), deciled AS (
            SELECT ((rn - 1) * 10) // n_cust AS decile, responder, n_cust
            FROM ranked
        ), rolled AS (
            SELECT decile,
                   CAST(MAX(n_cust) AS BIGINT) AS n_cust,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(responder) AS BIGINT) AS responders
            FROM deciled GROUP BY decile
        ), curved AS (
            SELECT decile, n, responders,
                   CAST(SUM(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
                   CAST(SUM(responders) OVER (ORDER BY decile) AS BIGINT)
                       AS cum_responders,
                   CAST(SUM(responders) OVER () AS BIGINT) AS total_resp,
                   n_cust
            FROM rolled
        )
        SELECT decile, n, responders, cum_responders,
               CASE WHEN total_resp > 0 AND n > 0 THEN
                   (responders * n_cust * 1000000) // (n * total_resp)
               END AS lift_micro,
               CASE WHEN total_resp > 0 THEN
                   (cum_responders * 1000000) // total_resp
               END AS gain_micro
        FROM curved
        ORDER BY decile
    """,
    tags=("stats", "eval", "analytics"),
)
def q_lift_curve(spark, sf_dir):
    """DECILE LIFT + CUMULATIVE GAINS over customers ranked by total
    spend — the campaign-targeting readout ("does the top decile of
    the spend ranking concentrate urgent-order responders, and by how
    much over random?"). Responder = customer with >= 1 urgent-priority
    order; decile d's lift = (responders_d/n_d)/(total_resp/n_cust),
    gains = cumulative responder share through decile d.

    Exactness: decile assignment is pure integer floor math
    ((rn-1)*10 DIV n) — NTILE-free, so both engines agree on boundary
    rows by construction. Lift/gain are floor-quantized micros on
    exact BIGINTs. Integer headroom: responders*n_cust*1e6 stays under
    2^63 to ~3e5 responders x 1e6 customers (sf ~40); past that the
    product jumps to DECIMAL(38,0) with no cross-engine constraint.

    Plan at 100 TB: fact-sized work is ONE per-customer hash agg (the
    q_pareto_abc discipline); the rank window runs over the aggregated
    customer dimension (2-pass range-partitioned prefix sum past ~1e9
    customers), and every curve window is a 10-row frame. The
    single-row n_cust/total_resp broadcasts are the q_bm25
    corpus-stats class.
    """
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("spend_cents"),
        F.max(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("responder"),
    )
    # two-phase range-bucketed rank over (spend desc, custkey) — no
    # single-partition row_number window over the customer rollup
    from flink_rc_spark.operators.windows import global_scan_salted

    per_cust = per_cust.transform(checkpoint, eager=True)  # shared w/ n_cust
    ranked = global_scan_salted(
        per_cust,
        "spend_cents",
        [F.col("spend_cents").desc(), F.col("o_custkey")],
        [{"kind": "count", "value": None, "out": "rn", "exclusive": False}],
        descending=True,
        materialize=False,
    ).select("responder", "rn")
    n_cust = per_cust.agg(F.count("*").cast("bigint").alias("n_cust"))
    deciled = ranked.crossJoin(F.broadcast(n_cust)).select(
        F.expr("((rn - 1) * 10) DIV n_cust").alias("decile"),
        "responder",
        "n_cust",
    )
    rolled = deciled.groupBy("decile").agg(
        F.max("n_cust").cast("bigint").alias("n_cust"),
        F.count("*").cast("bigint").alias("n"),
        F.sum("responder").cast("bigint").alias("responders"),
    )
    w_cum = Window.orderBy("decile")
    w_all = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    curved = rolled.select(
        "decile",
        "n",
        "responders",
        F.sum("n").over(w_cum).cast("bigint").alias("cum_n"),
        F.sum("responders").over(w_cum).cast("bigint").alias(
            "cum_responders"
        ),
        F.sum("responders").over(w_all).cast("bigint").alias("total_resp"),
        "n_cust",
    )
    return curved.select(
        "decile",
        "n",
        "responders",
        "cum_responders",
        F.when(
            (F.col("total_resp") > 0) & (F.col("n") > 0),
            F.expr("(responders * n_cust * 1000000) DIV (n * total_resp)"),
        ).alias("lift_micro"),
        F.when(
            F.col("total_resp") > 0,
            F.expr("(cum_responders * 1000000) DIV total_resp"),
        ).alias("gain_micro"),
    ).orderBy("decile")
