"""Semantic checks for the r7 wave: Welch t-test / effect size against
independent numpy reference implementations (scipy-gated extra when
importable), and magic-byte container sniffing."""

from __future__ import annotations

import numpy as np

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load

import pytest


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def _values(spark, sf_dir, types):
    ev = load(spark, sf_dir, "events").select("event_type", "value").collect()
    groups = {t: [] for t in types}
    for r in ev:
        if r.event_type in groups:
            # integer cents, as the keys quantize
            groups[r.event_type].append(round(r.value * 100))
    return {t: np.array(v, dtype=np.float64) for t, v in groups.items()}


def test_welch_ttest_matches_reference(spark, sf_dir):
    row = REGISTRY["q_welch_ttest"].builder(spark, sf_dir).collect()[0]
    g = _values(spark, sf_dir, ("purchase", "click"))
    a, b = g["purchase"], g["click"]
    assert row.n_a == len(a) and row.n_b == len(b)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(se2)
    df = se2**2 / ((va / len(a)) ** 2 / (len(a) - 1)
                   + (vb / len(b)) ** 2 / (len(b) - 1))
    assert abs(row.t_welch - t) < 1e-3, (row.t_welch, t)
    assert abs(row.df_ws - df) < max(0.05, 1e-4 * df), (row.df_ws, df)
    assert abs(row.mean_a - a.mean() / 100) < 1e-3
    try:
        from scipy import stats as ss
    except ImportError:
        return
    t2, _ = ss.ttest_ind(a, b, equal_var=False)
    assert abs(row.t_welch - t2) < 1e-3


def test_effect_size_matches_reference(spark, sf_dir):
    import hashlib

    row = REGISTRY["q_effect_size"].builder(spark, sf_dir).collect()[0]
    ev = load(spark, sf_dir, "events").select("event_id", "value").collect()
    arms = {0: [], 1: []}
    for r in ev:
        h = hashlib.md5(f"e{r.event_id}".encode()).hexdigest()
        arm = (int(h[0], 16) * 16 + int(h[1], 16)) % 2
        arms[arm].append(round(r.value * 100))
    a = np.array(arms[0], dtype=np.float64)
    b = np.array(arms[1], dtype=np.float64)
    assert row.n_a == len(a) and row.n_b == len(b)
    sp2 = ((len(a) - 1) * a.var(ddof=1) + (len(b) - 1) * b.var(ddof=1)) / (
        len(a) + len(b) - 2
    )
    d = (a.mean() - b.mean()) / np.sqrt(sp2)
    g = d * (1 - 3 / (4 * (len(a) + len(b)) - 9))
    assert abs(row.cohen_d - d) < 1e-4, (row.cohen_d, d)
    assert abs(row.hedges_g - g) < 1e-4, (row.hedges_g, g)
    # md5 arms are an A/A split: the honest reading is near-zero effect
    assert abs(row.cohen_d) < 0.1


def test_mime_sniff_unit_and_negative():
    from flink_rc_spark.llm.audio import encode_wav
    from flink_rc_spark.llm.codec import encode_bmp, encode_png
    from flink_rc_spark.llm.jpeg import encode_jpeg
    from flink_rc_spark.llm.multimodal import sniff_container
    from flink_rc_spark.llm.video import encode_avi

    arr = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    assert sniff_container(encode_bmp(arr)) == ("bmp", "native")
    assert sniff_container(encode_png(arr)) == ("png", "native")
    assert sniff_container(encode_jpeg(arr, quality=98)) == ("jpeg", "native")
    assert sniff_container(encode_wav(np.zeros(8, dtype=np.int16))) == (
        "wav", "riff")
    assert sniff_container(encode_avi([arr])) == ("avi", "riff")
    # negatives: truncated / foreign / mislabeled-RIFF payloads
    assert sniff_container(b"") == ("unknown", "unknown")
    assert sniff_container(b"GIF89a....") == ("unknown", "unknown")
    assert sniff_container(b"RIFF\x00\x00\x00\x00JUNK") == (
        "riff-unknown", "riff")


def test_mime_sniff_covers_all_formats(spark, sf_dir):
    rows = REGISTRY["q_mime_sniff"].builder(spark, sf_dir).collect()
    seen = {r.sniffed for r in rows}
    assert seen == {"bmp", "png", "jpeg", "wav", "avi"}, seen
    assert all(r.family in ("native", "riff") for r in rows)
