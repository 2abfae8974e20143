"""Unit tests for the shared per-group pair-cosine kernel
(flink_rc_spark/llm/pairkern.py) — tiling correctness is proven by
forcing tile sizes far smaller than the group, then comparing against
an untiled brute-force reference computed with the SAME sequential
dimension fold (so equality is exact, not approximate)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from flink_rc_spark.llm import pairkern
from flink_rc_spark.llm.pairkern import make_group_pair_kernel


def _group(n: int, dim: int = 8, seed: int = 7) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    m = rng.randn(n, dim)
    nrm = np.sqrt((m * m).sum(axis=1))
    ids = rng.permutation(n * 3)[:n].astype(np.int64)  # unsorted, sparse ids
    return pd.DataFrame(
        {"vec_id": ids, "e": [row for row in m], "nrm": nrm}
    )


def _brute(pdf: pd.DataFrame, thr: float):
    """Reference: all ascending-id pairs >= thr, sequential dim fold."""
    order = pdf["vec_id"].to_numpy().argsort()
    ids = pdf["vec_id"].to_numpy()[order]
    nrm = pdf["nrm"].to_numpy()[order]
    m = np.array([np.asarray(v) for v in pdf["e"]], dtype=np.float64)[order]
    k = len(ids)
    pairs = []
    for a in range(k):
        for b in range(a + 1, k):
            dot = 0.0
            for d in range(m.shape[1]):
                dot += m[a, d] * m[b, d]
            cos = dot / (nrm[a] * nrm[b])
            if cos >= thr:
                pairs.append((ids[a], ids[b], cos))
    return pairs


@pytest.fixture(autouse=True)
def _tiny_tiles(monkeypatch):
    """Force many row AND column tiles so every tile-boundary branch
    runs even on a 40-row group."""
    monkeypatch.setattr(pairkern, "ROW_BLK", 7)
    monkeypatch.setattr(pairkern, "COL_BLK", 5)
    yield


def test_pairs_mode_matches_brute_force():
    pdf = _group(40)
    got = make_group_pair_kernel(0.0, "pairs")(pdf)
    want = _brute(pdf, 0.0)
    got_t = sorted(zip(got["doc_a"], got["doc_b"], got["cos"]))
    assert len(got_t) == len(want)
    for (ga, gb, gc), (wa, wb, wc) in zip(got_t, sorted(want)):
        assert (ga, gb) == (wa, wb)
        assert gc == wc  # bit-exact: identical fold order


def test_pairs_mode_threshold_filters():
    pdf = _group(40)
    got = make_group_pair_kernel(0.3, "pairs")(pdf)
    want = _brute(pdf, 0.3)
    assert sorted(zip(got["doc_a"], got["doc_b"])) == [
        (a, b) for a, b, _ in sorted(want)
    ]
    assert (got["cos"] >= 0.3).all()


def test_first_neighbor_is_min_smaller_id():
    pdf = _group(60, seed=11)
    thr = 0.2
    got = make_group_pair_kernel(thr, "first_neighbor")(pdf)
    # reference: for each vec_b, the SMALLEST qualifying vec_a
    want: dict[int, tuple[int, float]] = {}
    for a, b, c in sorted(_brute(pdf, thr)):
        if b not in want:
            want[b] = (a, c)
    got_map = {
        v: (d, c)
        for v, d, c in zip(got["vec_id"], got["dup_of"], got["cosv"])
    }
    assert set(got_map) == set(want)
    for b, (a, c) in want.items():
        assert got_map[b][0] == a
        assert got_map[b][1] == c  # bit-exact


def test_degenerate_groups():
    for n in (0, 1):
        pdf = _group(max(n, 1)).head(n)
        for mode in ("pairs", "first_neighbor"):
            out = make_group_pair_kernel(0.0, mode)(pdf)
            assert len(out) == 0
            assert list(out.dtypes) == ["int64", "int64", "float64"]


def test_no_qualifying_pairs_returns_typed_empty():
    pdf = _group(10)
    out = make_group_pair_kernel(2.0, "pairs")(pdf)  # cos <= 1 always
    assert len(out) == 0
    out = make_group_pair_kernel(2.0, "first_neighbor")(pdf)
    assert len(out) == 0


def test_unknown_mode_rejected():
    with pytest.raises(ValueError):
        make_group_pair_kernel(0.5, "all")


def _hamming_fixture(n=120, seed=3):
    """Signatures clustered so many pairs sit within Hamming<=3, plus
    random far ones; returns (ids, sigs) and the per-band bucket rows
    the production plan would feed the kernel."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 1 << 60, size=n // 4, dtype=np.int64)
    sigs = []
    for b in base:
        sigs.append(b)
        for _ in range(3):
            s = int(b)
            for bit in rng.choice(60, rng.randint(0, 5), replace=False):
                s ^= 1 << int(bit)
            sigs.append(s)
    sigs = np.array(sigs[:n], dtype=np.int64)
    ids = rng.permutation(n * 2)[:n].astype(np.int64)
    return ids, sigs


def _band_rows(ids, sigs, band_bits=15, n_bands=4):
    rows = []
    for band in range(n_bands):
        buckets: dict[int, list[int]] = {}
        for i in range(len(ids)):
            key = (int(sigs[i]) >> (band_bits * band)) & ((1 << band_bits) - 1)
            buckets.setdefault(key, []).append(i)
        for mem in buckets.values():
            if len(mem) >= 2:
                rows.append(
                    {
                        "band": band,
                        "ids": [int(ids[i]) for i in mem],
                        "sigs": [int(sigs[i]) for i in mem],
                    }
                )
    return pd.DataFrame(rows)


def test_band_hamming_kernel_matches_all_pairs_exactly_once():
    """Kernel output over the banded buckets == brute-force all-pairs
    Hamming<=3 (the oracle's spelling), each pair EXACTLY once despite
    multi-band collisions — with forced tiny tiles."""
    from flink_rc_spark.llm.pairkern import make_band_hamming_kernel

    ids, sigs = _hamming_fixture()
    rows = _band_rows(ids, sigs)
    got = list(make_band_hamming_kernel(3, 15, 4)([rows]))
    got = (
        pd.concat(got)
        if got
        else pd.DataFrame(columns=["doc_a", "doc_b", "hamming"])
    )
    want = {}
    order = ids.argsort()
    sids, ssigs = ids[order], sigs[order]
    for a in range(len(sids)):
        for b in range(a + 1, len(sids)):
            h = bin(int(ssigs[a]) ^ int(ssigs[b])).count("1")
            if h <= 3:
                want[(sids[a], sids[b])] = h
    got_pairs = list(zip(got["doc_a"], got["doc_b"]))
    assert len(got_pairs) == len(set(got_pairs)), "pair emitted twice"
    assert dict(zip(got_pairs, got["hamming"])) == want
    assert len(want) > 10  # fixture actually exercises clusters


def test_band_hamming_kernel_singletons_and_empty():
    from flink_rc_spark.llm.pairkern import make_band_hamming_kernel

    pdf = pd.DataFrame(
        [{"band": 0, "ids": [5], "sigs": [123]}]
    )
    assert list(make_band_hamming_kernel(3, 15, 4)([pdf])) == []


def test_semantic_planes_formula_matches_sql():
    """The Python clamp(floor(log2(n/64)), 8, 24) must equal DuckDB's
    length(bin(...))-1 spelling for every n, including the power-of-two
    edges where a float log2 could round wrong."""
    import duckdb

    from flink_rc_spark.llm.dedup import _SEMANTIC_PLANES_SQL, _semantic_planes

    ns = [0, 1, 63, 64, 65, 511, 512, 513, 4095, 4096, 4097,
          2**14 * 64, 2**14 * 64 + 1, 2**24 * 64, 2**30]
    sql_expr = _SEMANTIC_PLANES_SQL.replace("COUNT(*)", "n")
    for n in ns:
        (got,) = duckdb.sql(
            f"SELECT {sql_expr} FROM (SELECT CAST({n} AS BIGINT) AS n)"
        ).fetchone()
        assert got == _semantic_planes(n), n


def test_semantic_planes_occupancy_bound():
    """buckets = 2^planes stays within [n/128, n] above the clamp floor
    — i.e. expected occupancy is bounded by a constant as n grows."""
    from flink_rc_spark.llm.dedup import _semantic_planes

    for n in (10**5, 10**6, 10**7, 10**9):
        p = _semantic_planes(n)
        if p < 24:  # below the cap the formula tracks the corpus
            assert 2**p <= n // 64 < 2 ** (p + 1)
