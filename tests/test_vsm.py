"""VSM + Existential conformance: Ray engine (norm pipeline + cosine
shard scoring) vs the Themis-semantics oracle. Norm float accumulation
order differs between oracle (ascending stem) and engine (ascending
term-part), so scores compare at 1e-9 rel tolerance; rankings must be
identical."""

import math

import numpy as np
import pytest

from themis_search_engine_ray.functions.vsm import idf_int
from themis_search_engine_ray.oracle import ThemisOracle
from themis_search_engine_ray.pipelines.index_build import (
    BuildConfig,
    build_index,
    build_norms,
)
from themis_search_engine_ray.sources.transcripts import write_synthetic
from themis_search_engine_ray.state.searcher import LocalSearchEngine, SearchEngine

N_TURNS = 500

QUERIES = [
    "meetings effective agent",
    "token model data response",
    "caresses ponies ties agreed",
    "relational conditional rational",
    "the and of",  # stopword-only -> empty
    "zzz unknownterm data",  # unknown stem inflates query norm only
    "agent agent data",  # repeated query term -> qtf weight 2/maxfreq
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vsm")
    corpus = str(tmp / "turns")
    write_synthetic(corpus, n_turns=N_TURNS, seed=3, turns_per_block=125)
    idx = str(tmp / "index")
    build_index(corpus, idx, BuildConfig(num_partitions=2, term_parts=4, salt_bits=2))
    build_norms(idx)
    import pyarrow.dataset as pads

    tab = pads.dataset(corpus, format="parquet").to_table()
    oracle = ThemisOracle(
        list(
            zip(
                tab["conv_id"].to_pylist(),
                tab["turn_idx"].to_pylist(),
                tab["text"].to_pylist(),
            )
        )
    )
    return idx, oracle


def test_idf_int_is_integer_division():
    # Java `N/df` int division (Indexer.java:766, VSM.java:299-301)
    assert idf_int(100, 3) == math.log(33) / math.log(2)
    assert idf_int(100, 51) == 0.0  # 100//51 == 1 -> log2(1)
    assert idf_int(7, 7) == 0.0


def test_norms_match_oracle(built):
    idx, oracle = built
    eng = LocalSearchEngine(idx)
    assert eng.shard.norms is not None
    from themis_search_engine_ray.stages.tokenize import doc_key

    want = oracle.doc_norms()
    assert len(want) > 0
    got = dict(zip(eng.shard.doc_ids.tolist(), eng.shard.norms.tolist()))
    for (c, t), n in want.items():
        np.testing.assert_allclose(got[doc_key(c, t)], n, rtol=1e-9)


def test_vsm_rank_identical(built):
    idx, oracle = built
    eng = SearchEngine(idx)
    try:
        for q in QUERIES:
            for k in (5, 20):
                got = eng.search_vsm(q, k=k)
                want = oracle.search_vsm(q, k=k)
                assert [(h.conv_id, h.turn_idx) for h in got] == [
                    (h.conv_id, h.turn_idx) for h in want
                ], q
                np.testing.assert_allclose(
                    np.array([h.score for h in got]),
                    np.array([h.score for h in want]),
                    rtol=1e-9,
                )
    finally:
        eng.close()


def test_vsm_local_matches_actor(built):
    idx, oracle = built
    loc = LocalSearchEngine(idx)
    for q in QUERIES[:3]:
        got = loc.search_vsm(q, k=10)
        want = oracle.search_vsm(q, k=10)
        assert [(h.conv_id, h.turn_idx) for h in got] == [
            (h.conv_id, h.turn_idx) for h in want
        ]


def test_existential(built):
    idx, oracle = built
    eng = LocalSearchEngine(idx)
    for q in QUERIES:
        for k in (5, 100):
            got = eng.search_existential(q, k=k)
            want = oracle.search_existential(q, k=k)
            assert [(h.conv_id, h.turn_idx, h.score) for h in got] == [
                (h.conv_id, h.turn_idx, h.score) for h in want
            ], q
