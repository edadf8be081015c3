"""Degenerate-corpus robustness: all-empty texts, stopword-only docs,
single-doc corpora — build, stats, and every retrieval model must
behave (no crashes, correct empties) end to end."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from themis_search_engine_ray.oracle import ThemisOracle
from themis_search_engine_ray.pipelines.index_build import (
    BuildConfig,
    build_index,
    build_norms,
)
from themis_search_engine_ray.state.searcher import LocalSearchEngine


def _build(tmp_path, rows, name):
    corpus = str(tmp_path / f"{name}_turns")
    import os

    os.makedirs(corpus)
    pq.write_table(
        pa.Table.from_pylist(
            [{"conv_id": c, "turn_idx": t, "text": x} for c, t, x in rows]
        ),
        f"{corpus}/part-0.parquet",
    )
    idx = str(tmp_path / f"{name}_idx")
    build_index(corpus, idx, BuildConfig(num_partitions=1, term_parts=2, salt_bits=1))
    return idx


def test_all_empty_corpus(ray_session, tmp_path):
    rows = [("c0", i, "") for i in range(8)]
    idx = _build(tmp_path, rows, "empty")
    eng = LocalSearchEngine(idx)
    assert eng.n_docs == 8
    assert eng.search("anything", k=5) == []
    assert eng.search_existential("anything", k=5) == []
    assert eng.search_phrase("any thing", k=5) == []
    oracle = ThemisOracle(rows)
    assert oracle.search("anything", k=5) == []


def test_stopword_only_corpus(ray_session, tmp_path):
    rows = [("c0", i, "the and of a an") for i in range(6)]
    idx = _build(tmp_path, rows, "stop")
    eng = LocalSearchEngine(idx)
    # dl counts non-stopword tokens -> all zero; avgdl 0; no postings
    assert eng.meta["avgdl"] == 0.0
    assert eng.search("the and", k=5) == []
    assert eng.search("data", k=5) == []
    build_norms(idx)
    eng2 = LocalSearchEngine(idx)
    assert eng2.search_vsm("the data", k=5) == []


def test_single_doc_corpus(ray_session, tmp_path):
    rows = [("solo", 0, "lonely document text here")]
    idx = _build(tmp_path, rows, "solo")
    eng = LocalSearchEngine(idx)
    oracle = ThemisOracle(rows)
    got = eng.search("lonely text", k=3)
    want = oracle.search("lonely text", k=3)
    assert [(h.conv_id, h.turn_idx, h.score) for h in got] == [
        (h.conv_id, h.turn_idx, h.score) for h in want
    ]
    # df == N -> idf = log2(0.5/1.5) < 0 for every term; still exact
    assert got and got[0].conv_id == "solo"


def test_ngram_jaccard_hot_shingle_bounded(ray_session, tmp_path):
    """1,000 identical docs share every shingle: the star cap must keep
    per-shingle pair emission O(n) (the old clique path emitted ~500k
    rows per shingle) while still verifying every emitted pair exactly.
    Components stay connected through the hub doc."""
    import os

    from themis_search_engine_ray.pipelines.dedup import ngram_jaccard_pairs

    d = str(tmp_path / "hotshingle")
    os.makedirs(d)
    rows = [
        {"doc_id": i, "text": "alpha beta gamma delta epsilon zeta"}
        for i in range(1000)
    ]
    pq.write_table(pa.Table.from_pylist(rows), f"{d}/documents.parquet")
    got = ngram_jaccard_pairs(d, threshold=0.5).to_pandas()
    hub = int(got["a"].min())
    assert hub == 0
    # star: hub connected to every other doc, all at jaccard 1.0
    assert set(got[got["a"] == hub]["b"]) == set(range(1, 1000))
    assert (got["jaccard"] == 1.0).all()
    # bounded: emission is O(n) per shingle, not O(n^2)
    assert len(got) < 1000 * 8


def test_verify_join_matches_scan(ray_session):
    """The fully distributed join verify (the auto-switch path past
    _VERIFY_SCAN_MAX_PAIRS candidates) must produce the same verified
    pairs as the driver-bounded scan verify, for both the minhash and
    the n-gram pipelines."""
    from themis_search_engine_ray.pipelines.dedup import (
        minhash_pairs_ds,
        ngram_jaccard_pairs,
    )
    import ray.data as rd

    sf = "/root/testdata/sf0.001"

    def pairs(df):
        return {
            (int(a), int(b), float(j))
            for a, b, j in zip(df["a"], df["b"], df["jaccard"])
        }

    ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    scan = minhash_pairs_ds(ds, verify="scan").to_pandas()
    join = minhash_pairs_ds(ds, verify="join").to_pandas()
    assert pairs(scan) == pairs(join)
    assert len(scan) > 0

    g_scan = ngram_jaccard_pairs(sf, verify="scan").to_pandas()
    g_join = ngram_jaccard_pairs(sf, verify="join").to_pandas()
    g_auto = ngram_jaccard_pairs(sf, verify="auto").to_pandas()
    assert pairs(g_scan) == pairs(g_join) == pairs(g_auto)


def test_embedding_lsh_verify_join_matches_scan(ray_session):
    """The distributed join verify for embedding-LSH dedup (the
    auto-switch path past _VERIFY_SCAN_MAX_PAIRS candidates) must
    produce pairs identical to the driver-bounded scan/broadcast
    verify — same candidates, same exact cosines."""
    from themis_search_engine_ray.pipelines.dedup import embedding_dup_pairs_lsh

    sf = "/root/testdata/sf0.001"

    def pairs(df):
        return {
            (int(a), int(b), float(c))
            for a, b, c in zip(df["a"], df["b"], df["cosine"])
        }

    scan = embedding_dup_pairs_lsh(sf, verify="scan").to_pandas()
    join = embedding_dup_pairs_lsh(sf, verify="join").to_pandas()
    assert pairs(scan) == pairs(join)
    assert len(scan) > 0


def test_minhash_exact_twin_equals_ground_truth(ray_session):
    """minhash_pairs_exact collapses the banding to one all-pairs
    bucket (candidate recall provably 1.0), so its verified output must
    equal the all-pairs Jaccard ground truth that ngram_jaccard_pairs'
    value-exact oracle checks."""
    from themis_search_engine_ray.pipelines.dedup import (
        minhash_pairs_exact,
        ngram_jaccard_pairs,
    )

    sf = "/root/testdata/sf0.001"

    def pairs(df):
        return {
            (int(a), int(b), float(j))
            for a, b, j in zip(df["a"], df["b"], df["jaccard"])
        }

    exact = minhash_pairs_exact(sf).to_pandas()
    truth = ngram_jaccard_pairs(sf).to_pandas()
    assert pairs(exact) == pairs(truth)
    assert len(exact) > 0


def test_minhash_exact_twin_guards_scale(ray_session, monkeypatch):
    """The all-pairs twin is O(n²) in ONE group task by construction —
    past the documented cap it must raise a clear error, not OOM."""
    from themis_search_engine_ray.pipelines import dedup

    monkeypatch.setattr(dedup, "_EXACT_TWIN_MAX_DOCS", 10)
    with pytest.raises(ValueError, match="all-pairs twin"):
        dedup.minhash_pairs_exact("/root/testdata/sf0.001")


def test_embedding_lsh_exact_equals_blocked_exact(ray_session):
    """One zero-bit band => every vector in one bucket => candidate
    recall provably 1.0: the degenerate LSH output must equal the
    blocked-exact all-pairs pipeline row for row (the value-exact
    driver twin's contract)."""
    from themis_search_engine_ray.pipelines.dedup import (
        embedding_dup_pairs,
        embedding_lsh_exact,
    )

    sf = "/root/testdata/sf0.001"
    a = (
        embedding_lsh_exact(sf)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    b = (
        embedding_dup_pairs(sf)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(a) > 0
    assert a.equals(b)
