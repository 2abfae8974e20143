"""Semantic checks for the r7 eval-curve / model-diagnostics wave
(AP, MRR, decile lift, Jarque-Bera, Ljung-Box, Cronbach's alpha),
each against a plain-Python recomputation."""

from __future__ import annotations

import math

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def _ranked_docs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "source", "lang", "n_chars", "doc_id"
    ).collect()
    per = {}
    for d in docs:
        per.setdefault(d.source, []).append(d)
    for src in per:
        per[src].sort(key=lambda d: (-d.n_chars, d.doc_id))
    return per


def test_eval_pr_curve_matches_python(spark, sf_dir):
    rows = {r.source: r for r in
            REGISTRY["q_eval_pr_curve"].builder(spark, sf_dir).collect()}
    per = _ranked_docs(spark, sf_dir)
    assert set(rows) == set(per)
    for src, docs in per.items():
        tp = 0
        ap_sum = 0
        n_rel = 0
        for i, d in enumerate(docs, start=1):
            if d.lang == "en":
                tp += 1
                n_rel += 1
                ap_sum += (tp * 1000000) // i
        r = rows[src]
        assert r.n_docs == len(docs) and r.n_rel == n_rel
        assert r.ap_micro_sum == ap_sum
        if n_rel:
            assert abs(r.avg_precision - ap_sum / (n_rel * 1e6)) < 1e-6
            # AP bounded by precision-at-full-recall limits
            assert 0.0 <= r.avg_precision <= 1.0


def test_eval_mrr_matches_python(spark, sf_dir):
    rows = {r.source: r for r in
            REGISTRY["q_eval_mrr"].builder(spark, sf_dir).collect()}
    per = _ranked_docs(spark, sf_dir)
    assert set(rows) == set(per)
    for src, docs in per.items():
        first = next(
            (i for i, d in enumerate(docs, start=1) if d.lang == "en"),
            None,
        )
        r = rows[src]
        assert r.first_rel_rank == first
        assert r.rr_micro == (1000000 // first if first else 0)


def test_lift_curve_matches_python(spark, sf_dir):
    rows = REGISTRY["q_lift_curve"].builder(spark, sf_dir).collect()
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderpriority"
    ).collect()
    per = {}
    for o in orders:
        spend, resp = per.get(o.o_custkey, (0, 0))
        per[o.o_custkey] = (
            spend + round(o.o_totalprice * 100),
            max(resp, 1 if o.o_orderpriority == "1-URGENT" else 0),
        )
    ranked = sorted(per.items(), key=lambda kv: (-kv[1][0], kv[0]))
    n_cust = len(ranked)
    dec = {}
    for rn, (_, (_, resp)) in enumerate(ranked, start=1):
        d = ((rn - 1) * 10) // n_cust
        n, r_ = dec.get(d, (0, 0))
        dec[d] = (n + 1, r_ + resp)
    total_resp = sum(r for _, r in dec.values())
    got = {r.decile: r for r in rows}
    assert set(got) == set(dec)
    cum_r = 0
    for d in sorted(dec):
        n, resp = dec[d]
        cum_r += resp
        r = got[d]
        assert (r.n, r.responders, r.cum_responders) == (n, resp, cum_r)
        assert r.lift_micro == (resp * n_cust * 1000000) // (n * total_resp)
        assert r.gain_micro == (cum_r * 1000000) // total_resp
    # gains curve is monotone and ends at 100%
    assert got[max(dec)].gain_micro == 1000000


def test_jarque_bera_matches_python(spark, sf_dir):
    rows = {r.event_type: r for r in
            REGISTRY["q_jarque_bera"].builder(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events").select("event_type", "value").collect()
    per = {}
    for e in ev:
        per.setdefault(e.event_type, []).append(round(e.value * 100))
    assert set(rows) == set(per)
    for t, cs in per.items():
        n = len(cs)
        mu = sum(cs) / n
        m2 = sum((c - mu) ** 2 for c in cs) / n
        m3 = sum((c - mu) ** 3 for c in cs) / n
        m4 = sum((c - mu) ** 4 for c in cs) / n
        skew = m3 / m2**1.5
        kurt = m4 / m2**2
        jb = n / 6 * (skew**2 + (kurt - 3) ** 2 / 4)
        r = rows[t]
        assert r.n == n
        # raw-moment vs central-moment float paths: loose tolerance
        assert abs(r.skewness - skew) < 1e-3
        assert abs(r.kurtosis - kurt) < 1e-3
        assert abs(r.jb_stat - jb) < max(1e-2, abs(jb) * 1e-3)
        assert r.reject_normal == (jb > 5.991465) or abs(jb - 5.991465) < 1e-2


def test_ljung_box_matches_python(spark, sf_dir):
    rows = {r.user_id: r for r in
            REGISTRY["q_ljung_box"].builder(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    per = {}
    for e in ev:
        per.setdefault(e.user_id, []).append((e.ts, e.event_id, math.floor(e.value)))
    checked = 0
    for u, seq in per.items():
        if len(seq) < 8:
            assert u not in rows
            continue
        seq.sort()
        xs = [q for _, _, q in seq]
        n = len(xs)
        mu = sum(xs) / n
        den = sum((x - mu) ** 2 for x in xs)
        if den == 0:
            assert u not in rows
            continue
        q_lb = 0.0
        for k in (1, 2, 3):
            num = sum(
                (xs[i] - mu) * (xs[i - k] - mu) for i in range(k, n)
            )
            q_lb += (num / den) ** 2 / (n - k)
        q_lb *= n * (n + 2)
        r = rows[u]
        assert r.n == n
        assert abs(r.lb_stat - q_lb) < max(1e-4, q_lb * 1e-6), (u, r.lb_stat, q_lb)
        checked += 1
    assert checked and checked == len(rows)


def test_cronbach_alpha_matches_python(spark, sf_dir):
    row = REGISTRY["q_cronbach_alpha"].builder(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    ev = load(spark, sf_dir, "events").select("user_id", "event_type").collect()
    cells = {}
    for e in ev:
        cells[(e.user_id, e.event_type)] = cells.get(
            (e.user_id, e.event_type), 0
        ) + 1
    users = sorted({u for u, _ in cells})
    items = sorted({t for _, t in cells})
    n_u, k = len(users), len(items)
    assert (r.k, r.n_users) == (k, n_u)

    def var_num(vals):
        return n_u * sum(v * v for v in vals) - sum(vals) ** 2

    item_num = sum(
        var_num([cells.get((u, t), 0) for u in users]) for t in items
    )
    tot_num = var_num(
        [sum(cells.get((u, t), 0) for t in items) for u in users]
    )
    assert (r.item_var_num, r.total_var_num) == (item_num, tot_num)
    alpha = (k / (k - 1)) * (1 - item_num / tot_num)
    assert abs(r.alpha - alpha) < 1e-6
    # alpha <= 1 by Cauchy-Schwarz on the covariance decomposition
    assert r.alpha <= 1.0 + 1e-9
