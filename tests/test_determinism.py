"""Parallelism-shape invariance (SURVEY §5.2 item 6): the same corpus
built under different partition counts / batch sizes / block splits
must serve IDENTICAL query results (docIDs and bit-equal scores), and
global stats must match exactly. This is the sandbox stand-in for
"same output at N and 4N nodes" — parallelism may only change wall
time, never content."""

import numpy as np
import pytest

from themis_search_engine_ray.pipelines.index_build import BuildConfig, build_index
from themis_search_engine_ray.sources.transcripts import write_synthetic
from themis_search_engine_ray.state.searcher import LocalSearchEngine

QUERIES = [
    "meetings effective agent",
    "token model data response",
    "agent data",
    "hopefulness goodness revival allowance",
]


@pytest.fixture(scope="module")
def corpora(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("det")
    corpus = str(tmp / "turns")
    write_synthetic(corpus, n_turns=400, seed=21, turns_per_block=80)

    shapes = {
        "p1_b64": BuildConfig(num_partitions=1, batch_size=64, term_parts=2, salt_bits=2),
        "p3_b256": BuildConfig(num_partitions=3, batch_size=256, term_parts=2, salt_bits=2),
        "p5_b32": BuildConfig(num_partitions=5, batch_size=32, term_parts=2, salt_bits=2),
    }
    metas, idxs = {}, {}
    for name, cfg in shapes.items():
        idx = str(tmp / name)
        metas[name] = build_index(corpus, idx, cfg)
        idxs[name] = idx
    return metas, idxs


def test_global_stats_invariant(corpora):
    metas, _ = corpora
    ref = metas["p1_b64"]
    for name, m in metas.items():
        assert m["n_docs"] == ref["n_docs"], name
        assert m["avgdl"] == ref["avgdl"], name
        assert m["n_postings"] == ref["n_postings"], name


def test_query_results_invariant(corpora):
    _, idxs = corpora
    engines = {name: LocalSearchEngine(idx) for name, idx in idxs.items()}
    ref = engines["p1_b64"]
    for q in QUERIES:
        want = [(h.conv_id, h.turn_idx, h.score) for h in ref.search(q, k=20)]
        for name, eng in engines.items():
            got = [(h.conv_id, h.turn_idx, h.score) for h in eng.search(q, k=20)]
            assert got == want, (name, q)  # bit-equal scores, same docs
