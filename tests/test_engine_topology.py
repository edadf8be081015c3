"""Serving-topology invariance: results must not depend on how shards
are packed onto actors (num_actors < num_shards, == num_shards), and a
fresh engine over the same index dir reproduces identical output."""

import pytest

from themis_search_engine_ray.oracle import ThemisOracle
from themis_search_engine_ray.pipelines.index_build import BuildConfig, build_index
from themis_search_engine_ray.sources.transcripts import write_synthetic
from themis_search_engine_ray.state.searcher import LocalSearchEngine, SearchEngine

QUERIES = ["meetings effective agent", "token model data", "agent", "zzz unknown"]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("topo")
    corpus = str(tmp / "turns")
    write_synthetic(corpus, n_turns=400, seed=13, turns_per_block=100)
    idx = str(tmp / "idx")
    build_index(corpus, idx, BuildConfig(num_partitions=2, term_parts=2, salt_bits=3))
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


def test_actor_packing_invariance(built):
    idx, oracle = built
    # 8 shards packed onto 1, 3, and 8 actors — identical results
    engines = [SearchEngine(idx, num_actors=n) for n in (1, 3, 8)]
    try:
        for q in QUERIES:
            want = [
                (h.conv_id, h.turn_idx, h.score) for h in oracle.search(q, k=15)
            ]
            for eng in engines:
                got = [
                    (h.conv_id, h.turn_idx, h.score) for h in eng.search(q, k=15)
                ]
                assert got == want, (len(eng.actors), q)
    finally:
        for eng in engines:
            eng.close()


def test_local_engine_is_reproducible(built):
    idx, _ = built
    a = LocalSearchEngine(idx)
    b = LocalSearchEngine(idx)
    for q in QUERIES:
        assert [(h.conv_id, h.turn_idx, h.score) for h in a.search(q, k=10)] == [
            (h.conv_id, h.turn_idx, h.score) for h in b.search(q, k=10)
        ]
