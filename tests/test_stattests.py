"""Golden-value semantics for the hypothesis-test / inequality wave
(operators/stattests.py) plus spot checks for the SQL-surface wave
(operators/sqlsurface.py).

The driver-shape parity (vs DuckDB at SF_DIR) is covered by the
auto-parametrized tests/test_correctness.py; these tests instead pin
the STATISTICS themselves on tiny hand-computed inputs, so a bug that
broke both engines symmetrically (shared-formula error) would still
be caught.
"""

from __future__ import annotations

import math

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_ks_golden(spark):
    # samples: A = [1,2,3], B = [2,4] -> D = max|F1-F2| at x=3: |1 - 1/2| = 1/2
    # d_num = max|F1*n2 - F2*n1| = |3*2 - 1*3| = 3 at x=3
    df = spark.createDataFrame(
        [("click", 1.0), ("click", 2.0), ("click", 3.0), ("view", 2.0), ("view", 4.0)],
        "event_type string, value double",
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    p = df.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("c2"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = p.select(
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    row = c.agg(
        F.max(F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))).alias("d")
    ).collect()[0]
    assert row.d == 3  # D = 3/6 = 0.5


def test_mwu_golden():
    # A = [1, 3], B = [2, 4]: ranks 1..4, R_A = 1 + 3 = 4, U_A = 4 - 3 = 1
    # doubled: r1_x2 = 8, u_x2 = 8 - 2*3 = 2 -> U = 1
    # with a tie: A = [1, 2], B = [2, 3]: midranks 1, 2.5, 2.5, 4
    # R_A = 3.5 -> r1_x2 = 7, u_x2 = 7 - 6 = 1 -> U = 0.5
    def u_stat(a, b):
        pooled = sorted(set(a) | set(b))
        before = 0
        r2 = 0
        for v in pooled:
            c1 = a.count(v)
            c = c1 + b.count(v)
            r2 += c1 * (2 * before + c + 1)
            before += c
        n1 = len(a)
        return (r2 - n1 * (n1 + 1)) / 2

    assert u_stat([1, 3], [2, 4]) == 1.0
    assert u_stat([1, 2], [2, 3]) == 0.5


def test_chi2_quantized_close_to_float(spark, sf_dir):
    # the 1e5-floor-quantized chi2 must sit within n_cells*1e-5*N of the
    # float-computed statistic
    row = REGISTRY["q_chi2_test"].builder(spark, sf_dir).collect()[0]
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{sf_dir}/events.parquet')"
    )
    f = con.execute(
        """
        WITH cell AS (
            SELECT event_type, user_id % 4 AS bucket, COUNT(*)::DOUBLE AS o
            FROM events GROUP BY 1, 2
        ), tot AS (
            SELECT o, SUM(o) OVER (PARTITION BY event_type) AS rt,
                   SUM(o) OVER (PARTITION BY bucket) AS ct,
                   SUM(o) OVER () AS n
            FROM cell
        )
        SELECT SUM((o - rt*ct/n)^2 / (rt*ct/n)) FROM tot
        """
    ).fetchone()[0]
    con.close()
    assert abs(row.chi2 - f) <= row.n_cells * 1e-5 * row.n + 1e-9


def test_auc_golden():
    # pos scores [3, 4], neg scores [1, 2] -> perfect ranking, AUC = 1
    # pos [1, 2], neg [3, 4] -> AUC = 0; pos [1, 3], neg [2, 4] -> 0.5? no:
    # pairs: (1>2)N,(1>4)N,(3>2)Y,(3>4)N -> 1/4
    def auc(pos, neg):
        before = 0
        r2 = 0
        for v in sorted(set(pos) | set(neg)):
            cp = pos.count(v)
            c = cp + neg.count(v)
            r2 += cp * (2 * before + c + 1)
            before += c
        np_ = len(pos)
        return (r2 - np_ * (np_ + 1)) / (2 * np_ * len(neg))

    assert auc([3, 4], [1, 2]) == 1.0
    assert auc([1, 2], [3, 4]) == 0.0
    assert auc([1, 3], [2, 4]) == 0.25
    assert auc([1, 2], [2, 3]) == 0.125  # tie counts half

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    # brute-force pairwise AUC for one source must equal the rank formula
    rows = con.execute(
        "SELECT n_chars, lang = 'en' FROM documents WHERE source = 'src0'"
    ).fetchall()
    con.close()
    pos = [r[0] for r in rows if r[1]]
    neg = [r[0] for r in rows if not r[1]]
    if pos and neg:
        brute = sum(
            1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
        ) / (len(pos) * len(neg))
        assert math.isclose(auc(pos, neg), brute)


def test_gini_golden(spark):
    # equal incomes -> G = 0; [0, 1] -> G = 1/2 (max for n=2 with a zero)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def gini(vals):
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], "k int, x double"
        ).select("k", F.col("x").cast("decimal(18,2)").alias("x"))
        rk = df.select(
            "x",
            F.row_number().over(Window.orderBy("x", "k")).cast("long").alias("i"),
            F.count("*")
            .over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .cast("long")
            .alias("n"),
        )
        g_num = F.lit(2) * F.sum(F.col("i") * F.col("x")) - (
            F.max("n") + F.lit(1)
        ) * F.sum("x")
        g_den = F.max("n") * F.sum("x")
        return rk.agg(
            (g_num.cast("double") / g_den.cast("double")).alias("g")
        ).collect()[0].g

    assert gini([5, 5, 5, 5]) == 0.0
    assert gini([0, 1]) == 0.5
    # known closed form: [1..n] -> G = (n-1)/(3n) ... for n=3: 2/9
    assert math.isclose(gini([1, 2, 3]), 2.0 / 9.0)


def test_benford_digits_complete(spark, sf_dir):
    out = REGISTRY["q_benford"].builder(spark, sf_dir).collect()
    digits = {r.digit for r in out}
    assert digits <= set("123456789")  # cents of positive prices: no 0/sign
    total_share = sum(r.share for r in out)
    assert math.isclose(total_share, 1.0, rel_tol=1e-9)


def test_distinct_on_is_latest(spark, sf_dir):
    from flink_rc_spark.sources.tables import load

    out = REGISTRY["q_distinct_on"].builder(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    assert out.count() == ev.select("user_id").distinct().count()
    # every returned ts is that user's max ts
    from pyspark.sql import functions as F

    mx = ev.groupBy("user_id").agg(F.max("ts").alias("mx"))
    bad = out.join(mx, "user_id").filter(F.col("ts") != F.col("mx")).count()
    assert bad == 0


def test_gaps_islands_invariants(spark, sf_dir):
    from pyspark.sql import functions as F

    out = REGISTRY["q_gaps_islands"].builder(spark, sf_dir)
    bad = out.filter(
        (F.col("n_islands") > F.col("n_days"))
        | (F.col("max_island_len") > F.col("n_days"))
        | (F.col("n_islands") < 1)
    ).count()
    assert bad == 0


def test_nullsafe_join_has_null_bucket(spark, sf_dir):
    from pyspark.sql import functions as F

    out = REGISTRY["q_join_nullsafe"].builder(spark, sf_dir)
    null_rows = out.filter(F.col("bucket").isNull()).collect()
    assert len(null_rows) == 1  # the NULL<=>NULL match survives
    assert null_rows[0].o_cnt > 0 and null_rows[0].c_cnt > 0
