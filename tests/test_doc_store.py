"""store_text doc store: the working RESULT_TYPE.FULL equivalent —
ranked hits resolve to their original turn texts."""

import pytest

from themis_search_engine_ray.pipelines.index_build import (
    BuildConfig,
    build_index,
    compact_index,
)
from themis_search_engine_ray.sources.transcripts import write_synthetic
from themis_search_engine_ray.state.searcher import LocalSearchEngine, fetch_texts


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("docstore")
    corpus = str(tmp / "turns")
    write_synthetic(corpus, n_turns=300, seed=31, turns_per_block=100)
    idx = str(tmp / "idx")
    build_index(
        corpus,
        idx,
        BuildConfig(num_partitions=2, term_parts=2, salt_bits=1, store_text=True),
    )
    import pyarrow.dataset as pads

    tab = pads.dataset(corpus, format="parquet").to_table()
    truth = {
        (c, t): x
        for c, t, x in zip(
            tab["conv_id"].to_pylist(),
            tab["turn_idx"].to_pylist(),
            tab["text"].to_pylist(),
        )
    }
    return idx, truth


def test_fetch_texts_matches_source(built):
    idx, truth = built
    eng = LocalSearchEngine(idx)
    hits = eng.search("agent data model", k=8)
    assert hits
    texts = fetch_texts(idx, hits)
    assert len(texts) == len(hits)
    for h in hits:
        assert texts[(h.conv_id, h.turn_idx)] == truth[(h.conv_id, h.turn_idx)]


def test_fetch_texts_after_compaction(built):
    idx, truth = built
    compact_index(idx)
    eng = LocalSearchEngine(idx)
    hits = eng.search("token response", k=5)
    texts = fetch_texts(idx, hits)
    for h in hits:
        assert texts[(h.conv_id, h.turn_idx)] == truth[(h.conv_id, h.turn_idx)]


def test_snippets(built):
    from themis_search_engine_ray.state.searcher import snippets

    idx, truth = built
    eng = LocalSearchEngine(idx)
    hits = eng.search("agent data", k=5)
    snips = snippets(idx, hits, "agent data", window=3)
    assert len(snips) == len(hits)
    for key, s in snips.items():
        assert "[[" in s and "]]" in s  # every hit matches ≥1 query stem
        # highlighted tokens really are query stems
        import re

        from themis_search_engine_ray.functions.porter import stem_token

        marked = re.findall(r"\[\[([a-z0-9]+)\]\]", s)
        assert marked and all(stem_token(m) in {"agent", "data"} for m in marked)


def test_fetch_without_store_text_is_empty(ray_session, tmp_path):
    corpus = str(tmp_path / "turns")
    write_synthetic(corpus, n_turns=100, seed=33, turns_per_block=50)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, BuildConfig(num_partitions=1, term_parts=2, salt_bits=1))
    eng = LocalSearchEngine(idx)
    hits = eng.search("agent", k=3)
    assert fetch_texts(idx, hits) == {}
