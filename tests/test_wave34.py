"""Semantic checks for the r7 fertility / streaming-sample / ntile
wave, each against a plain-Python recomputation."""

from __future__ import annotations

import hashlib

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_bpe_fertility_rolls_up_encode(spark, sf_dir):
    """Fertility per lang must be exactly the rollup of q_bpe_encode's
    audited per-doc counts — proving the two keys share one encoding."""
    enc = {r.doc_id: r for r in
           REGISTRY["q_bpe_encode"].builder(spark, sf_dir).collect()}
    langs = {r.doc_id: r.lang for r in
             load(spark, sf_dir, "documents").select("doc_id", "lang")
             .collect()}
    per = {}
    for did, r in enc.items():
        raw, bpe, n = per.get(langs[did], (0, 0, 0))
        per[langs[did]] = (raw + r.n_tok_raw, bpe + r.n_tok_bpe, n + 1)
    rows = {r.lang: r for r in
            REGISTRY["q_bpe_fertility"].builder(spark, sf_dir).collect()}
    assert set(rows) == set(per)
    for lang, (raw, bpe, n) in per.items():
        r = rows[lang]
        assert (r.n_docs, r.raw_tokens, r.bpe_tokens) == (n, raw, bpe)
        assert r.fertility_micro == (bpe * 1000000) // raw
        # merges can only shrink the token count
        assert r.fertility_micro <= 1000000


def test_stream_bottomk_matches_python_and_slicing(spark, sf_dir):
    from flink_rc_spark.streaming.replay import events_stream, run_to_memory
    from flink_rc_spark.streaming.stateful import _SBK_K, stream_bottomk
    from flink_rc_spark.util import ensure_package_shipped
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    one = [(r.event_type, r.h, r.event_id) for r in
           REGISTRY["q_stream_bottomk"].builder(spark, sf_dir).collect()]
    ev = load(spark, sf_dir, "events").select(
        "event_type", "event_id"
    ).collect()
    per = {}
    for e in ev:
        h = hashlib.md5(str(e.event_id).encode()).hexdigest()
        per.setdefault(e.event_type, []).append((h, e.event_id))
    expect = []
    for t in sorted(per):
        expect.extend(
            (t, h, i) for h, i in sorted(set(per[t]))[:_SBK_K]
        )
    assert one == expect

    ensure_package_shipped(spark)
    stats: dict = {}
    s = events_stream(spark, sf_dir, n_splits=4)
    out = run_to_memory(stream_bottomk(s), output_mode="append",
                        stats=stats)
    assert stats["num_batches"] >= 3, f"replay was not incremental: {stats}"
    w = Window.partitionBy("event_type").orderBy("h")
    sliced = [
        (r.event_type, r.h, r.event_id)
        for r in out.select("event_type", "h", "event_id").distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SBK_K).drop("rn")
        .orderBy("event_type", "h").collect()
    ]
    assert sliced == expect


def test_win_ntile_matches_python(spark, sf_dir):
    rows = REGISTRY["q_win_ntile"].builder(spark, sf_dir).collect()
    orders = load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    ).collect()
    per = {}
    for o in orders:
        per.setdefault(o.o_orderpriority, []).append(
            (round(o.o_totalprice * 100), o.o_orderkey)
        )
    expect = {}
    for prio, vals in per.items():
        vals.sort()
        n = len(vals)
        base, extra = divmod(n, 4)
        start = 0
        for b in range(1, 5):
            size = base + (1 if b <= extra else 0)
            chunk = vals[start : start + size]
            start += size
            if not chunk:
                continue
            cents = [c for c, _ in chunk]
            expect[(prio, b)] = (
                len(chunk), min(cents), max(cents), sum(cents)
            )
    got = {(r.o_orderpriority, r.quartile):
           (r.n, r.lo_cents, r.hi_cents, r.sum_cents) for r in rows}
    assert got == expect
