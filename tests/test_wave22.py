"""Semantic checks for the r7 ML-eval / geo wave against independent
pure-Python / numpy recomputations: confusion matrix, k-fold CV,
feature hashing, closed-form ridge, 1-NN supplier, trajectory length."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def _pred(cents):
    if cents > 20000000:
        return "1-URGENT"
    if cents > 15000000:
        return "2-HIGH"
    if cents > 10000000:
        return "3-MEDIUM"
    if cents > 5000000:
        return "4-NOT SPECIFIED"
    return "5-LOW"


def test_confusion_matrix_matches_reference(spark, sf_dir):
    rows = REGISTRY["q_confusion_matrix"].builder(spark, sf_dir).collect()
    orders = load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    pairs = [
        (r.o_orderpriority, _pred(round(r.o_totalprice * 100)))
        for r in orders
    ]
    classes = sorted({p[0] for p in pairs} | {p[1] for p in pairs})
    assert [r.cls for r in rows] == classes
    for r in rows:
        tp = sum(1 for lab, pr in pairs if lab == r.cls and pr == r.cls)
        fp = sum(1 for lab, pr in pairs if lab != r.cls and pr == r.cls)
        fn = sum(1 for lab, pr in pairs if lab == r.cls and pr != r.cls)
        assert (r.tp, r.fp, r.fn) == (tp, fp, fn)
        if tp + fp:
            assert abs(r.precision_ - tp / (tp + fp)) < 1e-6
        if tp + fn:
            assert abs(r.recall_ - tp / (tp + fn)) < 1e-6
        if 2 * tp + fp + fn:
            assert abs(r.f1 - 2 * tp / (2 * tp + fp + fn)) < 1e-6


def _fold(okey):
    h = hashlib.md5(f"o{okey}".encode()).hexdigest()
    return (int(h[0], 16) * 16 + int(h[1], 16)) % 5


def test_crossval_folds_matches_reference(spark, sf_dir):
    rows = REGISTRY["q_crossval_folds"].builder(spark, sf_dir).collect()
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    folds = {}
    for r in orders:
        folds.setdefault(_fold(r.o_orderkey), []).append(
            round(r.o_totalprice * 100)
        )
    assert len(rows) == 5
    total_n = sum(len(v) for v in folds.values())
    total_s = sum(sum(v) for v in folds.values())
    for r in rows:
        test = np.array(folds[r.fold], dtype=np.float64)
        n_tr = total_n - len(test)
        m = (total_s - test.sum()) / n_tr
        mse = ((test - m) ** 2).mean() / 1e8  # dollars^2
        assert (r.n_train, r.n_test) == (n_tr, len(test))
        assert abs(r.train_mean - m / 100) < 1e-3
        assert abs(r.test_mse - mse) < max(1e-3, 1e-5 * mse)


def test_feature_hashing_matches_reference(spark, sf_dir):
    rows = REGISTRY["q_feature_hashing"].builder(spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents").select("text").collect()
    occ, toks = {}, {}
    for d in docs:
        for t in d.text.split(" "):
            if not t:
                continue
            h = hashlib.md5(f"f{t}".encode()).hexdigest()
            b = (int(h[0], 16) * 16 + int(h[1], 16)) % 64
            occ[b] = occ.get(b, 0) + 1
            toks.setdefault(b, set()).add(t)
    assert {r.bucket: r.n_occ for r in rows} == occ
    assert {r.bucket: r.n_tokens for r in rows} == {
        b: len(s) for b, s in toks.items()
    }
    for r in rows:
        assert r.first_token == min(toks[r.bucket])


def test_ridge_cf_matches_numpy(spark, sf_dir):
    row = REGISTRY["q_ridge_cf"].builder(spark, sf_dir).collect()[0]
    li = load(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).collect()
    x1 = np.array([r.l_quantity for r in li], dtype=np.float64)
    x2 = np.array([round(r.l_discount * 100) for r in li], dtype=np.float64)
    y = np.array(
        [round(r.l_extendedprice * 100) for r in li], dtype=np.float64
    )
    X = np.column_stack([np.ones_like(x1), x1, x2])
    lam = 1000.0
    A = X.T @ X + lam * np.eye(3)
    b = X.T @ y
    beta = np.linalg.solve(A, b)
    assert row.n == len(li)
    for got, want in zip((row.beta0, row.beta1, row.beta2), beta):
        assert abs(got - want) < max(1e-3, 1e-6 * abs(want)), (got, want)


def test_geo_knn_matches_bruteforce(spark, sf_dir):
    rows = REGISTRY["q_geo_knn"].builder(spark, sf_dir).collect()
    cust = load(spark, sf_dir, "customer").select("c_custkey").collect()
    supp = load(spark, sf_dir, "supplier").select("s_suppkey").collect()
    sc = [
        (r.s_suppkey, (r.s_suppkey * 41) % 18000, (r.s_suppkey * 59) % 36000)
        for r in supp
    ]
    got = {r.c_custkey: (r.nearest_suppkey, r.d2) for r in rows}
    assert len(got) == len(cust)
    for r in cust[:200]:  # spot-check a bounded prefix
        clat = (r.c_custkey * 37) % 18000
        clon = (r.c_custkey * 53) % 36000
        best = min(
            ((clat - la) ** 2 + (clon - lo) ** 2, sk) for sk, la, lo in sc
        )
        assert got[r.c_custkey] == (best[1], best[0])


def test_geo_path_length_matches_reference(spark, sf_dir):
    rows = REGISTRY["q_geo_path_length"].builder(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    ).collect()
    paths = {}
    for r in ev:
        lat = (r.user_id * 37 + r.event_id * 17) % 18000
        lon = (r.user_id * 53 + r.event_id * 29) % 36000
        paths.setdefault(r.user_id, []).append((r.ts, lat, lon))
    stats = {}
    for u, pts in paths.items():
        pts.sort()
        steps = [
            abs(b[1] - a[1]) + abs(b[2] - a[2])
            for a, b in zip(pts, pts[1:])
        ]
        stats[u] = (len(pts), sum(steps), max(steps, default=0))
    top = sorted(stats.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    assert [(r.user_id, r.n_points, r.path_cd, r.max_step_cd) for r in rows] == [
        (u, n, p, m) for u, (n, p, m) in top
    ]
