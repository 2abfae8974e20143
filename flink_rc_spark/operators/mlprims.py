"""ML training/feature-engineering primitives, engine-exact: the CART
split search (decision stump), multinomial naive Bayes with a
confusion readout, leave-one-out smoothed target encoding, and
weight-of-evidence / information value.

Reference parity: the reference's ML surface is the ESN/readout
family (SURVEY.md §2.1 R4–R7); these are the TABULAR-ML primitives a
pipeline runs beside it — declared driver-north-star surface like the
q_ks_test statistics family.

Float policy:
- The stump's Gini cost compares EXACT rationals floor-quantized at
  1e9 in DECIMAL(38,0) (the q_chi2_test idiom) — no float impurity.
- Target encoding multiplies the global prior through, so the LOO
  encoding is a single exact rational, floor-quantized micro.
- Naive Bayes / WoE need ln: each log is rounded to 6 dp and the
  scores are exact integer sums of the quantized logs (the
  q_cooccur_pmi / q_ngram_lm decimal-routing idiom — both engines'
  ln agree far beyond 6 dp).

100 TB story: every key aggregates the fact scan down to a bounded
frame first (distinct thresholds / vocab×class cells / category
cells), then does the model arithmetic on that frame — training cost
is one or two map-combined hash aggs, never an iterative pass.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_rc_spark.registry import register
from flink_rc_spark.sources.tables import load


@register(
    "q_decision_stump",
    oracle="""
        WITH x AS (
            SELECT n_chars AS f,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM documents
        ), th AS (
            SELECT f,
                   CAST(SUM(y) AS BIGINT) AS pos_at,
                   CAST(COUNT(*) AS BIGINT) AS cnt_at
            FROM x GROUP BY f
        ), cum AS (
            SELECT f,
                   CAST(SUM(pos_at) OVER (ORDER BY f) AS BIGINT) AS pos_l,
                   CAST(SUM(cnt_at) OVER (ORDER BY f) AS BIGINT) AS n_l,
                   CAST(SUM(pos_at) OVER () AS BIGINT) AS pos_t,
                   CAST(SUM(cnt_at) OVER () AS BIGINT) AS n_t
            FROM th
        ), split AS (
            SELECT f AS threshold, n_l, n_t - n_l AS n_r,
                   pos_l, pos_t - pos_l AS pos_r,
                   ((n_l * n_l - pos_l * pos_l - (n_l - pos_l) * (n_l - pos_l))
                      * (n_t - n_l)
                    + ((n_t - n_l) * (n_t - n_l)
                       - (pos_t - pos_l) * (pos_t - pos_l)
                       - ((n_t - n_l) - (pos_t - pos_l))
                         * ((n_t - n_l) - (pos_t - pos_l)))
                      * n_l) * 1000000000
                   // (n_l * (n_t - n_l)) AS cost_e9
            FROM cum WHERE n_l > 0 AND n_t - n_l > 0
        )
        SELECT threshold, n_l, n_r, pos_l, pos_r, CAST(cost_e9 AS BIGINT) AS cost_e9
        FROM split
        ORDER BY cost_e9, threshold
        LIMIT 5
    """,
    tags=("ml", "stats", "window"),
)
def q_decision_stump(spark, sf_dir):
    """CART's inner loop as a query: the best 5 axis-aligned splits of
    n_chars predicting lang='en', scored by weighted Gini impurity —
    cost(t) ∝ A_L·n_R + A_R·n_L over n_L·n_R where A = n² − pos² −
    neg² (the Gini numerator scaled by n), an EXACT rational per
    threshold floor-quantized at 1e9 in DECIMAL(38,0): the argmin is
    decided on integers, no float impurity anywhere.

    Candidate thresholds are the distinct feature values with
    cumulative class counts from one window — the single-pass
    split-search every tree library implements, expressed
    relationally.

    Plan: groupBy(feature) map-combines the scan to the distinct-
    threshold frame; one cumulative window over it (the q_ks_test
    shape, same range-partition upgrade path); TakeOrdered(5).
    """
    docs = load(spark, sf_dir, "documents")
    x = docs.select(
        F.col("n_chars").alias("f"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    th = x.groupBy("f").agg(
        F.sum("y").alias("pos_at"), F.count("*").alias("cnt_at")
    )
    w = Window.orderBy("f").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("f").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = th.select(
        "f",
        F.sum("pos_at").over(w).alias("pos_l"),
        F.sum("cnt_at").over(w).alias("n_l"),
        F.sum("pos_at").over(wall).alias("pos_t"),
        F.sum("cnt_at").over(wall).alias("n_t"),
    )
    split = cum.filter(
        (F.col("n_l") > 0) & (F.col("n_t") - F.col("n_l") > 0)
    ).select(
        F.col("f").alias("threshold"),
        "n_l",
        (F.col("n_t") - F.col("n_l")).alias("n_r"),
        "pos_l",
        (F.col("pos_t") - F.col("pos_l")).alias("pos_r"),
        F.expr(
            "CAST((CAST(n_l AS DECIMAL(20,0)) * n_l - CAST(pos_l AS DECIMAL(20,0)) * pos_l"
            " - CAST(n_l - pos_l AS DECIMAL(20,0)) * (n_l - pos_l)) * (n_t - n_l) AS DECIMAL(38,0))"
            " + CAST((CAST(n_t - n_l AS DECIMAL(20,0)) * (n_t - n_l)"
            " - CAST(pos_t - pos_l AS DECIMAL(20,0)) * (pos_t - pos_l)"
            " - CAST((n_t - n_l) - (pos_t - pos_l) AS DECIMAL(20,0))"
            "   * ((n_t - n_l) - (pos_t - pos_l))) * n_l AS DECIMAL(38,0))"
        ).alias("_a"),
    ).select(
        "threshold",
        "n_l",
        "n_r",
        "pos_l",
        "pos_r",
        F.expr(
            "CAST(CAST(_a AS DECIMAL(38,0)) * 1000000000 AS DECIMAL(38,0))"
            " div (n_l * n_r)"
        ).alias("cost_e9"),
    )
    return split.orderBy("cost_e9", "threshold").limit(5)


_NB_VOCAB = 100
_NB_LANGS = ("de", "en", "es", "fr", "zh")


@register(
    "q_naive_bayes",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
            FROM documents
        ), vocab AS (
            SELECT w FROM (
                SELECT w, COUNT(*) AS c,
                       ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) AS rn
                FROM tok GROUP BY w
            ) WHERE rn <= {_NB_VOCAB}
        ), cls AS (
            SELECT lang AS c, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
        ), wc AS (
            SELECT t.lang AS c, t.w, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM tok t JOIN vocab v ON t.w = v.w
            GROUP BY t.lang, t.w
        ), totc AS (
            SELECT c, CAST(SUM(cnt) AS BIGINT) AS tot FROM wc GROUP BY c
        ), model AS (
            SELECT l.c, v.w,
                   CAST(ROUND(ln(
                       (COALESCE(wc.cnt, 0) + 1.0)
                       / (totc.tot + {_NB_VOCAB})) * 1000000) AS BIGINT)
                     AS logp_micro
            FROM (SELECT DISTINCT c FROM cls) l
            CROSS JOIN vocab v
            JOIN totc ON totc.c = l.c
            LEFT JOIN wc ON wc.c = l.c AND wc.w = v.w
        ), prior AS (
            SELECT c, CAST(ROUND(ln(CAST(n_docs AS DOUBLE)
                       / (SELECT SUM(n_docs) FROM cls)) * 1000000) AS BIGINT)
                     AS prior_micro
            FROM cls
        ), dw AS (
            SELECT t.doc_id, t.w, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM tok t JOIN vocab v ON t.w = v.w
            GROUP BY t.doc_id, t.w
        ), scores AS (
            SELECT d.doc_id, d.lang AS true_lang, p.c,
                   p.prior_micro
                     + COALESCE(CAST(SUM(dw.cnt * m.logp_micro) AS BIGINT), 0)
                     AS score_micro
            FROM documents d
            CROSS JOIN prior p
            LEFT JOIN dw ON dw.doc_id = d.doc_id
            LEFT JOIN model m ON m.c = p.c AND m.w = dw.w
            GROUP BY d.doc_id, d.lang, p.c, p.prior_micro
        ), pred AS (
            SELECT doc_id, true_lang, c AS pred_lang
            FROM (
                SELECT doc_id, true_lang, c,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY score_micro DESC, c) AS rn
                FROM scores
            ) WHERE rn = 1
        )
        SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred GROUP BY true_lang, pred_lang
    """,
    tags=("ml", "llm", "agg"),
)
def q_naive_bayes(spark, sf_dir):
    """Multinomial naive Bayes language classifier, trained and
    evaluated on the corpus in one query: add-1-smoothed token
    likelihoods over the top-100 vocabulary, log prior + Σ count·logp
    per (doc, class), argmax with a total-order tie-break, reported
    as the confusion matrix (the q_langid_eval readout for a LEARNED
    model instead of heuristic n-grams).

    Exactness: each ln rounds to 6 dp micro-units (the q_cooccur_pmi
    idiom) and every score is an exact integer sum of quantized logs
    — argmax compares integers, so prediction is engine-identical.

    Plan: the model is vocab×classes = 500 broadcast rows from two
    hash aggs; scoring joins each doc's vocab-restricted term counts
    against it and reduces per (doc, class); the confusion rollup is
    a ≤ 25-cell agg. One tokenize fan-out scan, everything after on
    bounded frames.
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("c"), "w"))
        )
        .filter(F.col("rn") <= _NB_VOCAB)
        .select("w")
    )
    cls = docs.groupBy(F.col("lang").alias("c")).agg(
        F.count("*").alias("n_docs")
    )
    wc = (
        tok.join(F.broadcast(vocab), "w")
        .groupBy(F.col("lang").alias("c"), "w")
        .agg(F.count("*").alias("cnt"))
    )
    totc = wc.groupBy("c").agg(F.sum("cnt").alias("tot"))
    model = (
        cls.select("c")
        .crossJoin(F.broadcast(vocab))
        .join(totc, "c")
        .join(wc, ["c", "w"], "left")
        .select(
            "c",
            "w",
            F.round(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1.0))
                    / (F.col("tot") + F.lit(_NB_VOCAB))
                )
                * 1000000
            )
            .cast("long")
            .alias("logp_micro"),
        )
    )
    total_docs = cls.agg(F.sum("n_docs").alias("all_docs"))
    prior = cls.crossJoin(F.broadcast(total_docs)).select(
        "c",
        F.round(
            F.log(F.col("n_docs").cast("double") / F.col("all_docs"))
            * 1000000
        )
        .cast("long")
        .alias("prior_micro"),
    )
    dw = (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt"))
    )
    base = docs.select("doc_id", F.col("lang").alias("true_lang")).crossJoin(
        F.broadcast(prior)
    )
    contrib = (
        dw.join(F.broadcast(model), "w")
        .groupBy("doc_id", "c")
        .agg(F.sum(F.col("cnt") * F.col("logp_micro")).alias("wsum"))
    )
    scores = base.join(contrib, ["doc_id", "c"], "left").select(
        "doc_id",
        "true_lang",
        "c",
        (
            F.col("prior_micro") + F.coalesce(F.col("wsum"), F.lit(0))
        ).alias("score_micro"),
    )
    pred = (
        scores.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.desc("score_micro"), "c"
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("true_lang", F.col("c").alias("pred_lang"))
    )
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count("*").alias("n_docs")
    )


@register(
    "q_target_encode",
    oracle="""
        WITH x AS (
            SELECT c.c_mktsegment AS segment,
                   CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS y
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ), seg AS (
            SELECT segment,
                   CAST(COUNT(*) AS BIGINT) AS n_seg,
                   CAST(SUM(y) AS BIGINT) AS pos_seg
            FROM x GROUP BY segment
        ), g AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM(y) AS BIGINT) AS pos_g
            FROM x
        )
        SELECT seg.segment, v.y, seg.n_seg, seg.pos_seg,
               CAST(((seg.pos_seg - v.y) * g.n_g + 20 * g.pos_g) * 1000000
                 // ((seg.n_seg - 1 + 20) * g.n_g) AS BIGINT) AS loo_enc_micro
        FROM seg CROSS JOIN g CROSS JOIN (VALUES (0), (1)) v(y)
    """,
    tags=("ml", "agg"),
)
def q_target_encode(spark, sf_dir):
    """Leave-one-out SMOOTHED target encoding of market segment
    against the 'urgent order' target — the feature-engineering op
    behind every gradient-boosting pipeline, with the leakage guard
    (each row's own label excluded) and additive smoothing toward the
    global prior (m = 20).

    enc(row) = (pos_seg − y + m·prior) / (n_seg − 1 + m); multiplying
    the global prior through makes it ONE exact rational,
    floor-quantized micro — and since the encoding depends on the row
    only through y ∈ {0, 1}, the audit emits the 2 distinct values
    per category (the whole encoder, 10 rows) rather than per-row
    output.

    Plan: one fact scan → per-segment counters + one global counter
    (broadcast single rows onto the 5-segment frame) → a 2-value
    lateral expansion. At 100 TB the encoder READ is this exact
    query; applying it is a broadcast join of these 10 rows.
    """
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    x = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == customer.c_custkey,
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    seg = x.groupBy("segment").agg(
        F.count("*").alias("n_seg"), F.sum("y").alias("pos_seg")
    )
    g = x.agg(F.count("*").alias("n_g"), F.sum("y").alias("pos_g"))
    ys = spark.createDataFrame([(0,), (1,)], "y int")
    return (
        seg.crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(ys))
        .select(
            "segment",
            "y",
            "n_seg",
            "pos_seg",
            # DECIMAL(38,0) headroom: the dividend nears BIGINT max at
            # sf1. Sign-safe by construction (the q_woe_iv exact-floor
            # shift: +1e6·divisor, div, −1e6): for y = 1 with
            # pos_seg = 0 the raw dividend goes negative, where Spark
            # div truncates toward zero but DuckDB // floors — the
            # shift makes the dividend nonnegative so truncation IS
            # floor, with no reachable-data precondition.
            F.expr(
                "CAST((CAST(pos_seg - y AS DECIMAL(20,0)) * n_g + 20 * pos_g)"
                " * 1000000"
                " + 1000000 * (CAST(n_seg - 1 + 20 AS DECIMAL(20,0)) * n_g)"
                " AS DECIMAL(38,0))"
                " div (CAST(n_seg - 1 + 20 AS DECIMAL(20,0)) * n_g)"
                " - 1000000"
            ).alias("loo_enc_micro"),
        )
    )


@register(
    "q_woe_iv",
    oracle="""
        WITH x AS (
            SELECT o_orderpriority AS bucket,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
            FROM orders
        ), b AS (
            SELECT bucket,
                   CAST(SUM(y) AS BIGINT) AS pos_b,
                   CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg_b
            FROM x GROUP BY bucket
        ), t AS (
            SELECT CAST(SUM(pos_b) AS BIGINT) AS pos_t,
                   CAST(SUM(neg_b) AS BIGINT) AS neg_t
            FROM b
        )
        SELECT b.bucket, b.pos_b, b.neg_b,
               CAST(ROUND(ln((CAST(b.pos_b AS DOUBLE) / t.pos_t)
                             / (CAST(b.neg_b AS DOUBLE) / t.neg_t))
                          * 1000000) AS BIGINT) AS woe_micro,
               CAST(((b.pos_b * t.neg_t - b.neg_b * t.pos_t) * 1000000
                  + 1000000 * (t.pos_t * t.neg_t))
                 // (t.pos_t * t.neg_t) - 1000000 AS BIGINT) AS dist_diff_micro
        FROM b CROSS JOIN t
        WHERE b.pos_b > 0 AND b.neg_b > 0
    """,
    tags=("ml", "stats", "agg"),
)
def q_woe_iv(spark, sf_dir):
    """Weight-of-evidence per order-priority bucket against the
    'order fully shipped' target — the credit-scoring encoder:
    WoE_b = ln((pos_b/POS)/(neg_b/NEG)), plus the exact distribution
    difference (pos_b/POS − neg_b/NEG) whose product with WoE is the
    bucket's Information-Value contribution.

    WoE quantizes one ln to 6 dp micro (the q_cooccur_pmi idiom); the
    distribution difference is a single exact rational (cross-
    multiplied) floor-quantized micro — so IV's two factors ship as
    engine-exact integers and the (rare, degenerate) one-class
    buckets are excluded like q_auc_roc's.

    Plan: one scan → 5-bucket hash agg → single-row totals broadcast.
    """
    orders = load(spark, sf_dir, "orders")
    x = orders.select(
        F.col("o_orderpriority").alias("bucket"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    b = x.groupBy("bucket").agg(
        F.sum("y").alias("pos_b"),
        (F.count("*") - F.sum("y")).alias("neg_b"),
    )
    t = b.agg(
        F.sum("pos_b").alias("pos_t"), F.sum("neg_b").alias("neg_t")
    )
    return (
        b.crossJoin(F.broadcast(t))
        .filter((F.col("pos_b") > 0) & (F.col("neg_b") > 0))
        .select(
            "bucket",
            "pos_b",
            "neg_b",
            F.round(
                F.log(
                    (F.col("pos_b").cast("double") / F.col("pos_t"))
                    / (F.col("neg_b").cast("double") / F.col("neg_t"))
                )
                * 1000000
            )
            .cast("long")
            .alias("woe_micro"),
            # signed dividend: exact-floor shift idiom (+1e6·D, div, −1e6);
            # DECIMAL(38,0) headroom (products near BIGINT max at sf1)
            F.expr(
                "CAST((CAST(pos_b AS DECIMAL(20,0)) * neg_t"
                " - CAST(neg_b AS DECIMAL(20,0)) * pos_t) * 1000000"
                " + 1000000 * (CAST(pos_t AS DECIMAL(20,0)) * neg_t)"
                " AS DECIMAL(38,0))"
                " div (CAST(pos_t AS DECIMAL(20,0)) * neg_t) - 1000000"
            ).alias("dist_diff_micro"),
        )
    )
