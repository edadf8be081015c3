"""Incremental append: new turns join an existing index; combined-corpus
results must match an oracle built over the union (idf/avgdl refresh),
re-appending the same files is a no-op, and stale derived artifacts are
invalidated."""

import os

import numpy as np
import pytest

from themis_search_engine_ray.oracle import ThemisOracle
from themis_search_engine_ray.pipelines.index_build import (
    BuildConfig,
    append_to_index,
    build_index,
    compact_index,
)
from themis_search_engine_ray.sources.transcripts import write_synthetic
from themis_search_engine_ray.state.searcher import LocalSearchEngine

QUERIES = ["meetings effective agent", "token model data", "agent"]


def _turns(corpus):
    import pyarrow.dataset as pads

    tab = pads.dataset(corpus, format="parquet").to_table()
    return list(
        zip(
            tab["conv_id"].to_pylist(),
            tab["turn_idx"].to_pylist(),
            tab["text"].to_pylist(),
        )
    )


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("append")
    a = str(tmp / "a")
    b = str(tmp / "b")
    write_synthetic(a, n_turns=300, seed=81, turns_per_block=100)
    write_synthetic(b, n_turns=200, seed=83, turns_per_block=100)
    # disambiguate conv ids between the two corpora (same seed space)
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import pyarrow as pa

    tabb = pads.dataset(b, format="parquet").to_table()
    conv2 = pa.array([f"B-{c}" for c in tabb["conv_id"].to_pylist()], pa.string())
    tabb = tabb.set_column(tabb.schema.get_field_index("conv_id"), "conv_id", conv2)
    for f in os.listdir(b):
        os.remove(os.path.join(b, f))
    pq.write_table(tabb, os.path.join(b, "part-0.parquet"))

    idx = str(tmp / "idx")
    cfg = BuildConfig(num_partitions=2, term_parts=2, salt_bits=2)
    build_index(a, idx, cfg)
    compact_index(idx)  # becomes stale on append; must be invalidated
    meta = append_to_index(idx, b, cfg)
    oracle = ThemisOracle(_turns(a) + _turns(b))
    return idx, oracle, meta, a, b, cfg


def test_appended_results_match_union_oracle(built):
    idx, oracle, meta, *_ = built
    assert meta["n_docs"] == oracle.n_docs == 500
    assert meta["avgdl"] == oracle.avgdl
    assert not os.path.isdir(os.path.join(idx, "compacted"))  # invalidated
    eng = LocalSearchEngine(idx)
    for q in QUERIES:
        got = eng.search(q, k=20)
        want = oracle.search(q, k=20)
        assert [(h.conv_id, h.turn_idx) for h in got] == [
            (h.conv_id, h.turn_idx) for h in want
        ], q
        np.testing.assert_array_equal(
            np.array([h.score for h in got]), np.array([h.score for h in want])
        )


def test_reappend_is_noop(built):
    idx, oracle, _, _, b, cfg = built
    meta2 = append_to_index(idx, b, cfg)
    assert meta2["appended_files"] == 0
    assert meta2["n_docs"] == oracle.n_docs


def test_append_guards(built, tmp_path):
    idx, *_ = built
    from themis_search_engine_ray.functions.analyzer import AnalyzerConfig

    with pytest.raises(ValueError, match="config mismatch"):
        append_to_index(
            idx, str(tmp_path), BuildConfig(analyzer=AnalyzerConfig(use_stemmer=False))
        )
