"""Semantic checks for q_image_dhash: the kernel's bit layout against
a pure-Python recomputation straight from the md5 generating
recurrence (independent of the BMP codec AND the SQL oracle), and the
banded pair output against a brute-force Hamming scan."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def _py_dhash(text: str) -> int:
    """24-bit dHash recomputed from the md5 recurrence: byte j of the
    pixel block is the j-th byte of md5(t)||md5(t+'g')||md5(t+'h');
    stored rows are bottom-up, decoded row y reads stored row 3-y."""
    raw = (
        hashlib.md5(text.encode()).digest()
        + hashlib.md5((text + "g").encode()).digest()
        + hashlib.md5((text + "h").encode()).digest()
    )

    def gray(y: int, x: int) -> int:
        o = 12 * (3 - y) + 3 * x
        return (raw[o] + raw[o + 1] + raw[o + 2]) // 3

    h = 0
    for y in range(4):
        for x in range(3):
            if gray(y, x + 1) > gray(y, x):
                h |= 1 << (3 * y + x)
    for y in range(3):
        for x in range(4):
            if gray(y + 1, x) > gray(y, x):
                h |= 1 << (12 + 4 * y + x)
    return h


def test_dhash_kernel_matches_md5_recurrence(spark, sf_dir):
    from flink_rc_spark.llm.multimodal import _dhash_batches, with_ahash_media

    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    )
    rows = with_ahash_media(docs).collect()
    texts = {x.doc_id: x.text for x in docs.collect()}
    assert set(texts) == {r.doc_id for r in rows}
    pdf = pd.DataFrame(
        {
            "doc_id": [r.doc_id for r in rows],
            "payload": [bytes(r.payload) for r in rows],
        }
    )
    out = pd.concat(list(_dhash_batches(iter([pdf]))))
    got = dict(zip(out["doc_id"], out["dhash"]))
    assert len(got) == len(rows)
    for doc_id, text in texts.items():
        assert got[doc_id] == _py_dhash(text), doc_id
        assert 0 <= got[doc_id] < (1 << 24)


def test_dhash_pairs_match_bruteforce(spark, sf_dir):
    rows = REGISTRY["q_image_dhash"].builder(spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    hashes = {r.doc_id: _py_dhash(r.text) for r in docs}
    ids = sorted(hashes)
    expect = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(hashes[a] ^ hashes[b]).count("1") <= 1
    }
    got = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    assert got == expect


def test_dbscan_matches_python_reference(spark, sf_dir):
    """Brute-force DBSCAN (no grid, no SQL) over the same derived
    points: neighbor sets by O(n^2) scan, cores by count, clusters by
    BFS over core-core edges with min-core-id labels."""
    rows = REGISTRY["q_dbscan"].builder(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events").select("event_id", "user_id").collect()
    pts = {}
    for r in ev:
        if r.event_id % 23 == 0:
            lat = (r.user_id % 50) * 360 + (r.event_id * 17 + r.user_id * 37) % 80
            lon = ((r.user_id * 7) % 50) * 720 + (
                r.event_id * 29 + r.user_id * 53
            ) % 80
            pts[r.event_id] = (lat, lon)
    ids = sorted(pts)
    nbrs = {i: set() for i in ids}
    for i in ids:
        for j in ids:
            if i < j:
                d2 = (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2
                if d2 <= 100 * 100:
                    nbrs[i].add(j)
                    nbrs[j].add(i)
    core = {i for i in ids if len(nbrs[i]) + 1 >= 5}
    label = {}
    for c in sorted(core):
        if c in label:
            continue
        comp, stack = [], [c]
        seen = {c}
        while stack:
            v = stack.pop()
            comp.append(v)
            for w in nbrs[v]:
                if w in core and w not in seen:
                    seen.add(w)
                    stack.append(w)
        m = min(comp)
        for v in comp:
            label[v] = m
    expect = {}
    for i in ids:
        if i in core:
            expect[i] = (1, label[i])
        else:
            cn = [label[w] for w in nbrs[i] if w in core]
            expect[i] = (0, min(cn) if cn else -1)
    got = {r.id: (r.is_core, r.label) for r in rows}
    assert got == expect
    assert len(core) > 0  # the clustered derivation must actually cluster
