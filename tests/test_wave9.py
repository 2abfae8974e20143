"""Semantic checks for the wave-9 keys: nearest as-of join, top-K
link prediction, windowed funnel, apriori triples, RAKE keywords.
"""

from __future__ import annotations

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_asof_nearest_is_closest(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_rc_spark.sources.tables import load

    out = REGISTRY["q_join_asof_nearest"].builder(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    # brute force on a sample of 50 events
    sample = {r.event_id: r for r in out.limit(50).collect()}
    purchases = {}
    for r in ev.filter(F.col("event_type") == "purchase").collect():
        purchases.setdefault(r.user_id, []).append((r.ts, r.event_id))
    probe = {
        r.event_id: r
        for r in ev.filter(
            F.col("event_id").isin(*sample.keys())
        ).collect()
    }
    def us(td):  # exact integer microseconds (total_seconds() is lossy)
        return td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds

    for eid, row in sample.items():
        ps = purchases.get(probe[eid].user_id, [])
        if not ps:
            assert row.nearest_purchase_id is None and row.dt_us is None
            continue
        et = probe[eid].ts
        best = min(
            ps,
            key=lambda p: (
                abs(us(p[0] - et)),
                0 if p[0] <= et else 1,  # tie -> earlier side
            ),
        )
        assert row.nearest_purchase_id == best[1], eid
        assert row.dt_us == us(best[0] - et), eid


def test_link_predict_nonadjacent_and_scored(spark, sf_dir):
    rows = REGISTRY["q_link_predict"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.part_a < r.part_b
        assert r.cn >= 1
        assert 0 < r.jaccard_micro <= 1_000_000
        assert r.ra_micro >= r.cn * 1  # each term >= 1e6/deg >= 1 micro
    cns = [r.cn for r in rows]
    assert cns == sorted(cns, reverse=True)


def test_funnel_windowed_tighter_than_unbounded(spark, sf_dir):
    w = REGISTRY["q_funnel_windowed"].builder(spark, sf_dir).collect()[0]
    u = REGISTRY["q_funnel_steps"].builder(spark, sf_dir).collect()[0]
    assert w.users_total == u.users_total
    assert w.reached_view == u.reached_view  # step 1 has no window
    assert w.reached_click_24h <= u.reached_click
    assert w.reached_purchase_24h <= u.reached_purchase
    # monotone funnel
    assert (
        w.users_total
        >= w.reached_view
        >= w.reached_click_24h
        >= w.reached_purchase_24h
    )


def test_apriori_triples_brute_support(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_rc_spark.sources.tables import load

    rows = REGISTRY["q_itemsets_apriori"].builder(spark, sf_dir).collect()
    assert rows
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    doc_words = [set(d.text.split(" ")) for d in docs]
    for r in rows[:5]:
        assert r.w1 < r.w2 < r.w3
        brute = sum(
            1 for ws in doc_words if {r.w1, r.w2, r.w3} <= ws
        )
        assert brute == r.support, (r.w1, r.w2, r.w3)
    supports = [r.support for r in rows]
    assert supports == sorted(supports, reverse=True)
    assert all(s >= 5 for s in supports)


def test_rake_phrases_exclude_stopwords(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_rc_spark.sources.tables import load

    rows = REGISTRY["q_keyword_rake"].builder(spark, sf_dir).collect()
    assert rows
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("w"))
    top5 = [
        r.w
        for r in tok.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(5)
        .collect()
    ]
    for r in rows:
        words = r.phrase.split(" ")
        assert len(words) == r.n_words
        assert not set(words) & set(top5), r.phrase
        assert r.score_micro > 0 and r.n_occurrences >= 1
