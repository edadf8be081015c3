"""Compaction (merge per-partition posting runs into one segment per
gkey) must preserve every query result bit-for-bit, collapse each
term's runs to exactly one, and keep global df/posting counts."""

import os

import pytest

from themis_search_engine_ray.oracle import ThemisOracle
from themis_search_engine_ray.pipelines.index_build import (
    BuildConfig,
    build_index,
    compact_index,
    load_meta,
)
from themis_search_engine_ray.sources.transcripts import write_synthetic
from themis_search_engine_ray.state.searcher import LocalSearchEngine

QUERIES = [
    "meetings effective agent",
    "token model data response",
    "agent",
    "hopefulness goodness revival",
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("compact")
    corpus = str(tmp / "turns")
    write_synthetic(corpus, n_turns=500, seed=17, turns_per_block=100)
    idx = str(tmp / "idx")
    # 5 partitions => up to 5 runs per (term, shard) before compaction
    build_index(corpus, idx, BuildConfig(num_partitions=5, term_parts=2, salt_bits=2))
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
    before = {
        q: [(h.conv_id, h.turn_idx, h.score) for h in LocalSearchEngine(idx).search(q, k=25)]
        for q in QUERIES
    }
    phrase_before = [
        (h.conv_id, h.turn_idx, h.score)
        for h in LocalSearchEngine(idx).search_phrase("effective agent", k=25)
    ]
    compact_index(idx)
    return idx, oracle, before, phrase_before


def test_compacted_results_bit_identical(built):
    idx, oracle, before, _ = built
    eng = LocalSearchEngine(idx)
    for q, want in before.items():
        got = [(h.conv_id, h.turn_idx, h.score) for h in eng.search(q, k=25)]
        assert got == want, q
        oracle_want = oracle.search(q, k=25)
        assert [(c, t) for c, t, _ in got] == [
            (h.conv_id, h.turn_idx) for h in oracle_want
        ], q


def test_compacted_single_run_per_term(built):
    idx, oracle, _, _ = built
    eng = LocalSearchEngine(idx)
    assert os.path.isdir(os.path.join(idx, "compacted", "segments"))
    # every (term, shard-view) now has at most num_shards runs total
    meta = load_meta(idx)
    for term in oracle.postings:
        assert len(eng.shard.term_runs(term)) <= meta["num_shards"], term
    # df totals preserved (sum over every segment row)
    total = sum(
        int(df) for tab in eng.shard.tables for df in tab["df"].to_pylist()
    )
    assert total == sum(len(p) for p in oracle.postings.values())


def test_compacted_positions_survive(built):
    idx, _, _, phrase_before = built
    eng = LocalSearchEngine(idx)
    got = [
        (h.conv_id, h.turn_idx, h.score)
        for h in eng.search_phrase("effective agent", k=25)
    ]
    assert got == phrase_before


def test_vsm_over_compacted_norms(built):
    """build_norms prefers the compacted layout (one merged run per
    term); VSM rankings must stay oracle-identical and scores match at
    the documented 1e-9 tolerance."""
    import numpy as np

    from themis_search_engine_ray.pipelines.index_build import build_norms

    idx, oracle, _, _ = built
    norms_dir = build_norms(idx)
    assert os.path.isdir(norms_dir)
    eng = LocalSearchEngine(idx)
    for q in QUERIES:
        got = eng.search_vsm(q, k=20)
        want = oracle.search_vsm(q, k=20)
        assert [(h.conv_id, h.turn_idx) for h in got] == [
            (h.conv_id, h.turn_idx) for h in want
        ], q
        np.testing.assert_allclose(
            [h.score for h in got], [h.score for h in want], rtol=1e-9
        )


def test_compacted_tiebreak_is_global_conv_turn_ordinal(built):
    """The distributed (Ray sort + per-block offsets) tie-break ordinal
    must equal the rank of each doc under lexicographic (conv_id,
    turn_idx) — across ALL salts and partitions."""
    import numpy as np
    import pyarrow.dataset as pads

    idx, _, _, _ = built
    ds_root = os.path.join(idx, "compacted", "doc_stats")
    tab = pads.dataset(ds_root, format="parquet").to_table()
    conv = np.asarray(tab["conv_id"].to_pylist(), dtype=object)
    turn = tab["turn_idx"].to_numpy()
    tb = tab["tiebreak"].to_numpy()
    # a permutation of 0..n-1
    assert sorted(tb.tolist()) == list(range(len(tb)))
    order = np.lexsort((turn, conv))
    np.testing.assert_array_equal(tb[order], np.arange(len(tb)))
