"""Semantic checks for the r7 log-analytics / string-similarity wave:
IP parse + subnet rollup, UA parsing, log-template mining, phonetic
blocking keys, and the trigram Jaccard join — each checked against an
independent pure-Python recomputation."""

from __future__ import annotations

import re

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_ip_funcs_matches_reference(spark, sf_dir):
    rows = REGISTRY["q_ip_funcs"].builder(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events").select("user_id").collect()
    subnets = {}
    for r in ev:
        u = r.user_id
        o1, o2 = u % 223 + 1, (u * 7) % 256
        key = (o1, o2)
        ev_cnt, users = subnets.get(key, (0, set()))
        users.add(u)
        subnets[key] = (ev_cnt + 1, users)
    top = sorted(
        subnets.items(),
        key=lambda kv: (-kv[1][0], f"{kv[0][0]}.{kv[0][1]}.0.0/16"),
    )[:10]
    assert len(rows) == min(10, len(subnets))
    for row, ((o1, o2), (cnt, users)) in zip(rows, top):
        assert row.subnet16 == f"{o1}.{o2}.0.0/16"
        assert row.n_events == cnt
        assert row.n_users == len(users)
        # private flag is all-or-nothing per /16 by construction
        private = o1 == 10 or (o1 == 172 and 16 <= o2 <= 31) or (
            o1 == 192 and o2 == 168
        )
        assert row.n_private == (cnt if private else 0)


def test_useragent_parse_families(spark, sf_dir):
    rows = REGISTRY["q_useragent_parse"].builder(spark, sf_dir).collect()
    fams = {(r.family, r.major): r for r in rows}
    # the 6-entry catalog yields exactly these (family, major) cells
    expected = {
        ("Chrome", "120"),
        ("Safari", "17"),
        ("Firefox", "121"),
        ("Edge", "120"),
        ("curl", "8"),
    }
    assert set(fams) == expected
    total = sum(r.n_hits for r in rows)
    assert total == load(spark, sf_dir, "events").count()
    for r in rows:
        assert r.is_browser == (
            1 if r.family in ("Chrome", "Edge", "Safari", "Firefox") else 0
        )
    # Safari appears via two catalog entries (mac + iPhone), so its
    # share should be roughly 2/6 of events — sanity, not exactness
    saf = fams[("Safari", "17")].n_hits
    assert 0.15 < saf / total < 0.5


def test_log_templates_masking(spark, sf_dir):
    rows = REGISTRY["q_log_templates"].builder(spark, sf_dir).collect()
    n_events = load(spark, sf_dir, "events").count()
    assert sum(r.n_lines for r in rows) == n_events
    assert len(rows) <= 10  # 5 event types x optional [ALERT]
    for r in rows:
        assert not re.search(r"[0-9]", r.template)
        assert re.sub(r"[0-9]+", "<N>", r.example) == r.template


def test_phonetic_key_groups(spark, sf_dir):
    rows = REGISTRY["q_phonetic_key"].builder(spark, sf_dir).collect()

    def pkey(tok):
        return tok[:1] + re.sub(r"[aeiouy]", "", tok[1:])

    for r in rows:
        forms = r.forms.split(",")
        assert r.n_forms == len(forms) > 1
        assert forms == sorted(forms)
        for f in forms:
            assert pkey(f) == r.pkey, (f, r.pkey)


def test_str_ngram_sim_exact_jaccard(spark, sf_dir):
    rows = REGISTRY["q_str_ngram_sim"].builder(spark, sf_dir).collect()
    names = sorted(
        {
            r.p_name
            for r in load(spark, sf_dir, "part").select("p_name").collect()
            if len(r.p_name) >= 3
        }
    )

    def grams(n):
        return {n[i : i + 3] for i in range(len(n) - 2)}

    expected = {}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            g1, g2 = grams(names[i]), grams(names[j])
            shared = len(g1 & g2)
            if shared == 0:
                continue
            jac = shared * 1_000_000 // (len(g1) + len(g2) - shared)
            if jac >= 300_000:
                expected[(names[i], names[j])] = (shared, jac)
    got = {(r.name1, r.name2): (r.shared, r.jac_micro) for r in rows}
    assert got == expected
