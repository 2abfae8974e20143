"""Semantic checks for the r7 correlation/robust-stats wave against
independent numpy reference implementations (scipy-gated extras where
importable): Spearman rho, Kendall tau-b, Cramér's V, Brown–Forsythe,
Mann–Kendall, Theil–Sen, and the odds-ratio atanh-series log."""

from __future__ import annotations

import math

import numpy as np
import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def _rankdata(a):
    """Midrank ranks (average of tied positions), numpy-only."""
    a = np.asarray(a)
    order = np.argsort(a, kind="mergesort")
    ranks = np.empty(len(a), dtype=np.float64)
    sa = a[order]
    i = 0
    while i < len(a):
        j = i
        while j + 1 < len(a) and sa[j + 1] == sa[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def test_spearman_matches_reference(spark, sf_dir):
    row = REGISTRY["q_corr_spearman"].builder(spark, sf_dir).collect()[0]
    o = {
        r.o_orderkey: round(r.o_totalprice * 100)
        for r in load(spark, sf_dir, "orders").collect()
    }
    cnt = {}
    for r in load(spark, sf_dir, "lineitem").select("l_orderkey").collect():
        cnt[r.l_orderkey] = cnt.get(r.l_orderkey, 0) + 1
    keys = sorted(set(o) & set(cnt))
    x = np.array([o[k] for k in keys], dtype=np.float64)
    y = np.array([cnt[k] for k in keys], dtype=np.float64)
    rx, ry = _rankdata(x), _rankdata(y)
    rho = np.corrcoef(rx, ry)[0, 1]
    assert row.n == len(keys)
    assert abs(row.rho - rho) < 1e-5, (row.rho, rho)
    try:
        from scipy import stats as ss
    except ImportError:
        return
    rho2, _ = ss.spearmanr(x, y)
    assert abs(row.rho - rho2) < 1e-5


def test_kendall_tau_matches_reference(spark, sf_dir):
    row = REGISTRY["q_kendall_tau"].builder(spark, sf_dir).collect()[0]
    cust = {}
    for r in load(spark, sf_dir, "customer").collect():
        s, n = cust.get(r.c_nationkey, (0, 0))
        cust[r.c_nationkey] = (s + round(r.c_acctbal * 100), n + 1)
    supp = {}
    for r in load(spark, sf_dir, "supplier").collect():
        supp[r.s_nationkey] = supp.get(r.s_nationkey, 0) + 1
    ks = sorted(set(cust) & set(supp))
    c = d = tx = ty = 0
    for a in range(len(ks)):
        for b in range(a + 1, len(ks)):
            (si, ni), (sj, nj) = cust[ks[a]], cust[ks[b]]
            dx = si * nj - sj * ni
            dy = supp[ks[a]] - supp[ks[b]]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
    n0 = len(ks) * (len(ks) - 1) // 2
    assert (row.k_items, row.n0) == (len(ks), n0)
    assert (row.c_pairs, row.d_pairs) == (c, d)
    assert (row.tx_pairs, row.ty_pairs) == (tx, ty)
    if n0 > tx and n0 > ty:
        tau = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
        assert abs(row.tau_b - tau) < 1e-5
    else:
        assert row.tau_b is None


def test_cramers_v_matches_reference(spark, sf_dir):
    row = REGISTRY["q_cramers_v"].builder(spark, sf_dir).collect()[0]
    ev = load(spark, sf_dir, "events").select("event_type", "ts").collect()
    cells = {}
    for r in ev:
        dow = (r.ts.date() - __import__("datetime").date(1970, 1, 1)).days % 7
        cells[(r.event_type, dow)] = cells.get((r.event_type, dow), 0) + 1
    n = sum(cells.values())
    rows = sorted({k[0] for k in cells})
    cols = sorted({k[1] for k in cells})
    chi2 = 0.0
    for rr in rows:
        for cc in cols:
            o = cells.get((rr, cc), 0)
            e = (
                sum(v for k, v in cells.items() if k[0] == rr)
                * sum(v for k, v in cells.items() if k[1] == cc)
                / n
            )
            chi2 += (o - e) ** 2 / e
    v = math.sqrt(chi2 / (n * (min(len(rows), len(cols)) - 1)))
    assert row.n == n
    assert (row.r_levels, row.c_levels) == (len(rows), len(cols))
    # the key's statistic floor-quantizes each cell term at 1e-5, so
    # the committed value is within n_cells*1e-5-ish of the float ref
    assert abs(row.cramers_v - v) < 5e-3, (row.cramers_v, v)


def test_levene_bf_matches_reference(spark, sf_dir):
    row = REGISTRY["q_levene_bf"].builder(spark, sf_dir).collect()[0]
    ev = load(spark, sf_dir, "events").select("event_type", "value").collect()
    groups = {}
    for r in ev:
        groups.setdefault(r.event_type, []).append(round(r.value * 100))
    zs = []
    for g in groups.values():
        a = np.array(sorted(g), dtype=np.float64)
        med = np.percentile(a, 50)  # linear interpolation, (n-1)q
        zs.append(np.abs(2 * np.array(g) - 2 * med))
    k = len(zs)
    n = sum(len(z) for z in zs)
    grand = sum(z.sum() for z in zs) / n
    ssb = sum(len(z) * (z.mean() - grand) ** 2 for z in zs)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (row.k, row.n) == (k, n)
    assert abs(row.bf_stat - f) < max(1e-3, 1e-4 * f), (row.bf_stat, f)
    try:
        from scipy import stats as ss
    except ImportError:
        return
    f2, _ = ss.levene(
        *[np.array(g, dtype=np.float64) for g in groups.values()],
        center="median",
    )
    assert abs(row.bf_stat - f2) < max(1e-3, 1e-3 * f2)


def _daily_purchases(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    ).collect()
    daily = {}
    for r in ev:
        if r.event_type != "purchase":
            continue
        d = (r.ts.date() - __import__("datetime").date(1970, 1, 1)).days
        daily[d] = daily.get(d, 0) + round(r.value * 100)
    return sorted(daily.items())


def test_mann_kendall_matches_reference(spark, sf_dir):
    row = REGISTRY["q_mann_kendall"].builder(spark, sf_dir).collect()[0]
    series = _daily_purchases(spark, sf_dir)
    xs = [x for _, x in series]
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(xs)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    assert (row.n_days, row.s_stat, row.var18) == (n, s, var18)
    if s != 0:
        z = (s - (1 if s > 0 else -1)) / math.sqrt(var18 / 18)
        assert abs(row.z_mk - z) < 1e-3


def test_theil_sen_matches_reference(spark, sf_dir):
    row = REGISTRY["q_theil_sen"].builder(spark, sf_dir).collect()[0]
    series = _daily_purchases(spark, sf_dir)
    slopes = sorted(
        (series[j][1] - series[i][1]) / (series[j][0] - series[i][0])
        for i in range(len(series))
        for j in range(i + 1, len(series))
    )
    n0 = len(slopes)
    med = (slopes[(n0 + 1) // 2 - 1] + slopes[(n0 + 2) // 2 - 1]) / 2
    assert (row.n_days, row.n_pairs) == (len(series), n0)
    assert abs(row.slope_cpd - med) < 1e-5


def test_odds_ratio_series_accuracy(spark, sf_dir):
    """The defined atanh-series log must agree with libm ln to far
    below the 1e-6 rounding quantum on the actual cells."""
    row = REGISTRY["q_odds_ratio"].builder(spark, sf_dir).collect()[0]
    a, b, c, d = row.a, row.b, row.c, row.d
    orr = ((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5))
    assert abs(row.log_or - math.log(orr)) < 1e-6
    se = math.sqrt(
        1 / (a + 0.5) + 1 / (b + 0.5) + 1 / (c + 0.5) + 1 / (d + 0.5)
    )
    assert abs(row.se_log_or - se) < 1e-6
    assert abs(row.ci_lo_log - (math.log(orr) - 1.96 * se)) < 2e-6
    assert abs(row.ci_hi_log - (math.log(orr) + 1.96 * se)) < 2e-6
    assert row.or_micro == (a * d * 1_000_000) // (b * c)
