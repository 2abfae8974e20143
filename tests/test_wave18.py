"""Semantic checks for the wave-18 lakehouse source keys: partition
discovery pruning and schema-merge reads.
"""

from __future__ import annotations

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_partitioned_read_prunes_directories(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_rc_spark.operators.scans import _partitioned_dir

    d = _partitioned_dir(spark, sf_dir)
    df = spark.read.parquet(d)
    # the partition column comes from directory names
    assert "lang" in df.columns
    pruned = df.filter(F.col("lang") == "en")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filters reach the scan (directory pruning, not row filter)
    assert "PartitionFilters" in plan and "lang" in plan
    # and the pruned read matches the unpruned aggregate
    total = dict(
        df.groupBy("lang").count().collect()
    )


def test_mergeschema_columns_null_filled(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_rc_spark.operators.scans import _mergeschema_dir

    d = _mergeschema_dir(spark, sf_dir)
    df = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(df.columns) == {"doc_id", "lang", "source", "n_chars"}
    # old-schema rows (even doc_id) have lang, lack source/n_chars
    bad = df.filter(
        (F.col("doc_id") % 2 == 0)
        & (F.col("lang").isNull() | F.col("source").isNotNull())
    ).count()
    assert bad == 0
    bad = df.filter(
        (F.col("doc_id") % 2 == 1)
        & (F.col("source").isNull() | F.col("lang").isNotNull())
    ).count()
    assert bad == 0


def test_source_audits_match_table(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_rc_spark.operators.scans import _PART_DOCS
    from flink_rc_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _PART_DOCS
    )
    part_rows = {
        r.lang: r.n_docs
        for r in REGISTRY["q_source_partitioned"].builder(spark, sf_dir).collect()
    }
    true_rows = dict(docs.groupBy("lang").count().collect())
    assert part_rows == true_rows
    ms = REGISTRY["q_source_mergeschema"].builder(spark, sf_dir).collect()[0]
    assert ms.n_rows == docs.count()
    assert ms.n_lang + ms.n_source == ms.n_rows  # disjoint halves


def test_multiset_ops_bag_identities(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_rc_spark.sources.tables import load

    li = load(spark, sf_dir, "lineitem")
    cnt_r = dict(
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("l_partkey")
        .count()
        .collect()
    )
    cnt_a = dict(
        li.filter(F.col("l_returnflag") == "A")
        .groupBy("l_partkey")
        .count()
        .collect()
    )
    exc = {
        r.l_partkey: r.multiplicity
        for r in REGISTRY["q_set_except_all"].builder(spark, sf_dir).collect()
    }
    inter = {
        r.l_partkey: r.multiplicity
        for r in REGISTRY["q_set_intersect_all"]
        .builder(spark, sf_dir)
        .collect()
    }
    for k in set(cnt_r) | set(cnt_a):
        want_exc = max(cnt_r.get(k, 0) - cnt_a.get(k, 0), 0)
        want_int = min(cnt_r.get(k, 0), cnt_a.get(k, 0))
        assert exc.get(k, 0) == want_exc, k
        assert inter.get(k, 0) == want_int, k


def test_kruskal_wallis_matches_scipy(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_rc_spark.sources.tables import load

    row = REGISTRY["q_kruskal_wallis"].builder(spark, sf_dir).collect()[0]
    assert row.k_groups == 5
    try:
        from scipy import stats as ss
    except ImportError:
        ss = None
    ev = load(spark, sf_dir, "events").select("event_type", "value").collect()
    groups = {}
    for r in ev:
        groups.setdefault(r.event_type, []).append(r.value)
    if ss is not None:
        h, _ = ss.kruskal(*groups.values())
        # scipy applies the tie correction; ours is uncorrected, ties are
        # vanishingly rare on 2-decimal values -> agree to ~1e-2
        assert abs(row.h_micro / 1e6 - h) < 0.05
    else:
        # fallback: brute midrank H
        import itertools

        pooled = sorted(
            itertools.chain.from_iterable(groups.values())
        )
        from collections import Counter

        cnt = Counter(pooled)
        start = {}
        run = 0
        for v in sorted(cnt):
            start[v] = run
            run += cnt[v]
        n = len(pooled)
        h = -3 * (n + 1)
        for vals in groups.values():
            s2 = sum(2 * start[v] + cnt[v] + 1 for v in vals)
            h += 3 * (s2 * s2 / len(vals)) / (n * (n + 1))
        assert abs(row.h_micro / 1e6 - h) < 1e-3


def test_runs_test_brute(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_rc_spark.sources.tables import load

    row = REGISTRY["q_runs_test"].builder(spark, sf_dir).collect()[0]
    daily = sorted(
        (
            r.d,
            r.c,
        )
        for r in load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("long")
            ).alias("c")
        )
        .collect()
    )
    signs = []
    for (d0, c0), (d1, c1) in zip(daily, daily[1:]):
        if c1 != c0:
            signs.append(1 if c1 > c0 else -1)
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    assert row.n_up == signs.count(1)
    assert row.n_down == signs.count(-1)
    assert row.n_runs == runs


def test_anova_matches_scipy(spark, sf_dir):
    from flink_rc_spark.sources.tables import load

    row = REGISTRY["q_anova_oneway"].builder(spark, sf_dir).collect()[0]
    assert row.k == 5 and row.ssb_c2 >= 0 and row.ssw_c2 > 0
    try:
        from scipy import stats as ss
    except ImportError:
        ss = None
    ev = load(spark, sf_dir, "events").select("event_type", "value").collect()
    groups = {}
    for r in ev:
        groups.setdefault(r.event_type, []).append(round(r.value * 100))
    if ss is not None:
        f, _ = ss.f_oneway(*groups.values())
        assert abs(row.f_stat - f) < 1e-3
    else:
        # brute SSB/SSW on integer cents
        all_vals = [v for g in groups.values() for v in g]
        n = len(all_vals)
        s = sum(all_vals)
        q = sum(v * v for v in all_vals)
        t_sum = sum(
            (sum(g) * sum(g)) // len(g) for g in groups.values()
        )
        assert row.ssb_c2 == t_sum - (s * s) // n
        assert row.ssw_c2 == q - t_sum
