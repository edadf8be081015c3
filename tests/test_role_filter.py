"""Role-fielded search: with_role builds carry the transcript role into
doc_stats; search(role=...) filters hits to that role with BM25 stats
staying corpus-global (filter commutes with ranking, so the engine's
filtered top-k must equal the oracle's full ranking filtered then
cut)."""

import pytest

from themis_search_engine_ray.oracle import ThemisOracle
from themis_search_engine_ray.pipelines.index_build import BuildConfig, build_index
from themis_search_engine_ray.sources.transcripts import write_synthetic
from themis_search_engine_ray.state.searcher import LocalSearchEngine, SearchEngine


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("role")
    corpus = str(tmp / "turns")
    write_synthetic(corpus, n_turns=400, seed=51, turns_per_block=100)
    idx = str(tmp / "idx")
    build_index(
        corpus,
        idx,
        BuildConfig(num_partitions=2, term_parts=2, salt_bits=2, with_role=True),
    )
    import pyarrow.dataset as pads

    tab = pads.dataset(corpus, format="parquet").to_table()
    rows = list(
        zip(
            tab["conv_id"].to_pylist(),
            tab["turn_idx"].to_pylist(),
            tab["text"].to_pylist(),
        )
    )
    role_of = {
        (c, t): r
        for c, t, r in zip(
            tab["conv_id"].to_pylist(),
            tab["turn_idx"].to_pylist(),
            tab["role"].to_pylist(),
        )
    }
    return idx, ThemisOracle(rows), role_of


QUERIES = ["agent data model", "token response", "meetings effective agent"]


def test_role_filter_matches_filtered_oracle(built):
    idx, oracle, role_of = built
    eng = LocalSearchEngine(idx)
    roles = sorted(set(role_of.values()))
    assert len(roles) >= 2
    for q in QUERIES:
        full = oracle.search(q, k=None)
        for role in roles[:2]:
            want = [
                (h.conv_id, h.turn_idx, h.score)
                for h in full
                if role_of[(h.conv_id, h.turn_idx)] == role
            ][:10]
            got = [
                (h.conv_id, h.turn_idx, h.score)
                for h in eng.search(q, k=10, role=role)
            ]
            assert got == want, (q, role)


def test_role_filter_actor_engine_and_unknown_role(built):
    idx, oracle, role_of = built
    eng = SearchEngine(idx)
    try:
        role = sorted(set(role_of.values()))[0]
        got = eng.search("agent data", k=5, role=role)
        assert got and all(role_of[(h.conv_id, h.turn_idx)] == role for h in got)
        assert eng.search("agent data", k=5, role="nosuchrole") == []
    finally:
        eng.close()


def test_roleless_index_ignores_filter(ray_session, tmp_path):
    corpus = str(tmp_path / "turns")
    write_synthetic(corpus, n_turns=100, seed=53, turns_per_block=50)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, BuildConfig(num_partitions=1, term_parts=2, salt_bits=1))
    eng = LocalSearchEngine(idx)
    # no role data in the index -> any role filter yields no hits
    assert eng.search("agent", k=5, role="assistant") == []
    assert eng.search("agent", k=5) != []
