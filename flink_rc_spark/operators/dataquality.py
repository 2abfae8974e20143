"""Schema-level data-quality audits: functional-dependency discovery
and referential-integrity (foreign-key orphan) checks — the Deequ /
Great-Expectations constraint suite a warehouse runs before trusting a
new load.

Reference parity: none — the reference is a numeric dataflow engine
(SURVEY.md §1.1); this is driver-north-star analytics surface, the
same family as q_dq_checks / q_analyze_stats.

Float policy: every number here is an exact BIGINT count; violation
ratios are the consumer's one division.

100 TB story: each candidate/edge is ONE hash aggregation (or one
distinct + anti-join pair) whose output is a single audit row; the
per-candidate subplans are independent and union into the report, so
the whole audit is embarrassingly parallel across constraints and
each constraint is a standard shuffle whose key is the constraint's
own LHS — no operator sees more than (distinct LHS) rows after the
map-side combine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_rc_spark.registry import register
from flink_rc_spark.sources.tables import load

# candidate FDs audited (table, lhs, rhs) — a mix of true keys (must
# hold), hierarchy edges (must hold), and plausible-but-false
# dependencies (the interesting finds)
_FD_CANDIDATES = [
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("documents", "source", "lang"),
    ("nation", "n_nationkey", "n_regionkey"),
]


def _fd_oracle_one(table: str, lhs: str, rhs: str) -> str:
    return f"""
        SELECT '{table}.{lhs}->{rhs}' AS fd,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS violating_groups,
               CAST(MAX(k) AS BIGINT) AS max_rhs_per_lhs,
               SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) = 0 AS holds
        FROM (
            SELECT {lhs}, COUNT(DISTINCT {rhs}) AS k
            FROM {table} GROUP BY {lhs}
        )
    """


@register(
    "q_fd_discovery",
    oracle="\nUNION ALL\n".join(
        _fd_oracle_one(t, l, r) for t, l, r in _FD_CANDIDATES
    )
    + "\nORDER BY fd",
    tags=("quality", "agg"),
)
def q_fd_discovery(spark, sf_dir):
    """FUNCTIONAL-DEPENDENCY audit over 5 declared candidates
    (A → B holds iff no A-value maps to two B-values) — the
    profiling step that discovers real keys and hierarchy edges
    (o_orderkey→o_custkey, n_nationkey→n_regionkey) and refutes
    plausible ones (source→lang, o_custkey→priority), feeding both
    schema documentation and join-cardinality planning.

    Exactness: per candidate, ONE groupBy(lhs).agg(countDistinct(rhs))
    then a single-row rollup of exact BIGINTs; `holds` is an integer
    comparison.

    Plan at 100 TB: each candidate is an independent subplan — a
    partial+final hash agg keyed on its own LHS (map-side combine
    crushes the fact before the shuffle); the report union is 5 rows.
    A production variant audits many candidates per scan by grouping
    on a struct of LHS columns; the per-candidate algebra is
    unchanged.
    """
    parts = []
    for table, lhs, rhs in _FD_CANDIDATES:
        t = load(spark, sf_dir, table)
        per = t.groupBy(lhs).agg(F.countDistinct(rhs).alias("k"))
        parts.append(
            per.agg(
                F.count("*").cast("bigint").alias("n_groups"),
                F.sum(F.when(F.col("k") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("violating_groups"),
                F.max("k").cast("bigint").alias("max_rhs_per_lhs"),
            ).select(
                F.lit(f"{table}.{lhs}->{rhs}").alias("fd"),
                "n_groups",
                "violating_groups",
                "max_rhs_per_lhs",
                (F.col("violating_groups") == 0).alias("holds"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("fd")


# FK edges of the TPC-H-ish schema: (edge label, child table, child
# key, parent table, parent key)
_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey"),
]


def _fk_oracle_one(label, child, ckey, parent, pkey) -> str:
    return f"""
        SELECT '{label}' AS edge,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}) AS child_rows,
               CAST(COUNT(*) AS BIGINT) AS distinct_keys,
               CAST(SUM(CASE WHEN orphan THEN 1 ELSE 0 END) AS BIGINT)
                   AS orphan_keys,
               CAST(SUM(CASE WHEN orphan THEN rows_ ELSE 0 END) AS BIGINT)
                   AS orphan_rows
        FROM (
            SELECT c.{ckey} NOT IN (SELECT {pkey} FROM {parent}) AS orphan,
                   rows_
            FROM (
                SELECT {ckey}, COUNT(*) AS rows_
                FROM {child} GROUP BY {ckey}
            ) c
        )
    """


@register(
    "q_fk_integrity",
    oracle="\nUNION ALL\n".join(
        _fk_oracle_one(*e) for e in _FK_EDGES
    )
    + "\nORDER BY edge",
    tags=("quality", "join", "agg"),
)
def q_fk_integrity(spark, sf_dir):
    """REFERENTIAL-INTEGRITY audit across all 7 FK edges of the schema:
    per edge, the distinct child-key count plus orphan keys/rows
    (child keys with no parent) — the load-gate check that catches a
    partial dimension load before every downstream inner join silently
    drops fact rows. All-zero orphans IS the expected (and asserted)
    result on a consistent load; the child_rows / distinct_keys
    columns double as the join-cardinality profile.

    Exactness: child side collapses to (key, row-count) by ONE hash
    agg; orphans come from a LEFT ANTI join of that distinct frame
    against the parent keys. Pure BIGINT counts.

    Plan at 100 TB: the anti-join's left side is already distinct
    (bounded by key cardinality, not fact rows), and every parent here
    is dimension-sized so Spark broadcasts it; a fact-to-fact edge
    (lineitem->orders) falls back to a shuffled anti-join on the join
    key — the same exchange the production join itself needs. Each
    edge is an independent subplan; the report is 7 rows.
    """
    parts = []
    for label, child, ckey, parent, pkey in _FK_EDGES:
        c = load(spark, sf_dir, child)
        p = load(spark, sf_dir, parent).select(F.col(pkey).alias("_pk"))
        keys = c.groupBy(ckey).agg(F.count("*").alias("rows_"))
        orphans = keys.join(
            p, keys[ckey] == p["_pk"], "left_anti"
        ).agg(
            F.count("*").cast("bigint").alias("orphan_keys"),
            F.coalesce(F.sum("rows_"), F.lit(0))
            .cast("bigint")
            .alias("orphan_rows"),
        )
        totals = keys.agg(
            F.count("*").cast("bigint").alias("distinct_keys"),
            F.sum("rows_").cast("bigint").alias("child_rows"),
        )
        parts.append(
            totals.crossJoin(orphans).select(
                F.lit(label).alias("edge"),
                "child_rows",
                "distinct_keys",
                "orphan_keys",
                "orphan_rows",
            )
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out.orderBy("edge")
