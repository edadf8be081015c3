"""Block-max pruning (MaxScore over skip-entry block maxima) is exact:
pruned and unpruned top-k are identical — docIDs AND scores bit-equal —
and the pruning actually engages (probes a strict subset of blocks) on
a skewed corpus (north_star: block-max WAND-style pruning, per-shard
top-k, merge-sort reduce)."""

import numpy as np
import pytest

from themis_search_engine_ray.functions.analyzer import analyze_query
from themis_search_engine_ray.functions.bm25 import idf as bm25_idf
from themis_search_engine_ray.oracle import ThemisOracle
from themis_search_engine_ray.pipelines.index_build import BuildConfig, build_index
from themis_search_engine_ray.state.searcher import LocalSearchEngine


@pytest.fixture(scope="module")
def skewed(ray_session, tmp_path_factory):
    """Corpus with one hot term ('alpha', in ~90% of docs) and rare
    terms, so MaxScore demotes the hot term to non-essential."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tmp_path_factory.mktemp("prune")
    rng = np.random.default_rng(7)
    rare = [f"rare{i:03d}" for i in range(40)]
    mid = [f"mid{i:02d}" for i in range(12)]
    rows = []
    for d in range(1200):
        words = []
        if rng.random() < 0.9:
            words += ["alpha"] * int(rng.integers(1, 4))  # negative idf
        if rng.random() < 0.35:
            words.append("beta")  # hot but positive idf → non-essential
        words += list(rng.choice(mid, size=int(rng.integers(2, 6))))
        if rng.random() < 0.5:
            words.append(str(rng.choice(rare)))  # df ≈ 15 per rare term
        words += [f"filler{int(x)}" for x in rng.integers(0, 400, size=6)]
        rng.shuffle(words)
        rows.append(
            {"conv_id": f"c{d // 8:05d}", "turn_idx": d % 8, "text": " ".join(words)}
        )
    corpus = str(tmp / "turns")
    import os

    os.makedirs(corpus)
    pq.write_table(pa.Table.from_pylist(rows), f"{corpus}/part-0.parquet")
    idx = str(tmp / "index")
    build_index(corpus, idx, BuildConfig(num_partitions=1, term_parts=4, salt_bits=1))
    oracle = ThemisOracle([(r["conv_id"], r["turn_idx"], r["text"]) for r in rows])
    return idx, oracle


QUERIES = [
    "beta rare003",
    "beta rare007 mid04",
    "beta mid01 mid02 rare011",
    "rare001 rare002 rare003",
    "beta mid00",
    "beta filler3 rare021 mid11",
    "alpha rare003 mid02",  # negative-idf term in the mix → fallback path
]


def test_pruned_equals_unpruned_and_oracle(skewed):
    idx, oracle = skewed
    eng = LocalSearchEngine(idx)
    for q in QUERIES:
        for k in (3, 10, 50):
            pruned = eng.search(q, k=k, prune=True)
            full = eng.search(q, k=k, prune=False)
            assert [(h.conv_id, h.turn_idx, h.score) for h in pruned] == [
                (h.conv_id, h.turn_idx, h.score) for h in full
            ], (q, k)
            want = oracle.search(q, k=k)
            assert [(h.conv_id, h.turn_idx) for h in pruned] == [
                (h.conv_id, h.turn_idx) for h in want
            ], (q, k)
            np.testing.assert_array_equal(
                np.array([h.score for h in pruned]), np.array([h.score for h in want])
            )


def test_pruning_engages_on_skew(skewed):
    """The hot term must be demoted to non-essential and only probed —
    strictly fewer blocks decoded than it has."""
    idx, _ = skewed
    eng = LocalSearchEngine(idx)
    engaged = False
    for q in QUERIES[:3]:
        eng.search(q, k=3, prune=True)
        st = eng.shard.last_prune_stats
        if st.get("pruned") and st["non_essential_terms"] >= 1:
            assert st["probed_blocks"] <= st["non_essential_blocks_total"]
            engaged = True
    assert engaged, "MaxScore never engaged on a skewed corpus"


def test_cold_sparse_probe_path(skewed):
    """With an empty run cache and few candidates, the probe must take
    the per-block skip-decode branch (probed_blocks < total) and still
    match the full evaluation bit-for-bit."""
    idx, oracle = skewed
    eng = LocalSearchEngine(idx)
    q = "beta rare003"
    full = eng.search(q, k=3, prune=False)
    eng.shard._run_cache.clear()
    eng.shard._cache_bytes = 0
    pruned = eng.search(q, k=3, prune=True)
    st = eng.shard.last_prune_stats
    assert [(h.conv_id, h.turn_idx, h.score) for h in pruned] == [
        (h.conv_id, h.turn_idx, h.score) for h in full
    ]
    if st.get("pruned") and st["non_essential_terms"]:
        assert st["probed_blocks"] <= st["non_essential_blocks_total"]
    # warm second run (cache hit) must be identical too
    again = eng.search(q, k=3, prune=True)
    assert [(h.conv_id, h.turn_idx, h.score) for h in again] == [
        (h.conv_id, h.turn_idx, h.score) for h in full
    ]


def test_negative_idf_falls_back_and_matches(skewed):
    """df > N/2 terms (negative idf) disable pruning but stay exact."""
    idx, oracle = skewed
    eng = LocalSearchEngine(idx)
    # 'alpha' is in ~90% of docs → idf < 0
    terms = analyze_query("alpha mid05", eng.analyzer_cfg)
    idfs = [bm25_idf(float(eng.n_docs), eng.df[t]) for t in terms]
    assert any(i < 0 for i in idfs)
    got = eng.search("alpha mid05", k=10, prune=True)
    assert not eng.shard.last_prune_stats  # fallback, no prune stats
    want = oracle.search("alpha mid05", k=10)
    assert [(h.conv_id, h.turn_idx, h.score) for h in got] == [
        (h.conv_id, h.turn_idx, h.score) for h in want
    ]
