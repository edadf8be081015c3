"""Exact-phrase search over the positional index: engine vs oracle,
stopword-slot semantics, and hand-built corpora with known matches."""

import numpy as np
import pytest

from themis_search_engine_ray.oracle import ThemisOracle
from themis_search_engine_ray.pipelines.index_build import BuildConfig, build_index
from themis_search_engine_ray.state.searcher import LocalSearchEngine, SearchEngine


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tmp_path_factory.mktemp("phrase")
    rows = [
        ("c0", 0, "alpha beta gamma delta"),
        ("c0", 1, "beta alpha gamma"),          # words present, order wrong
        ("c0", 2, "alpha beta"),                # exact bigram
        ("c1", 0, "state of the art methods"),  # stopword slots inside
        ("c1", 1, "state art methods"),         # adjacent, WRONG slots
        ("c1", 2, "the state of the art"),
        ("c2", 0, "running quickly running quickly running"),  # stems + repeats
        ("c2", 1, "runs quick"),                # stems to run/quick: slot-adjacent
        ("c2", 2, "alpha alpha beta"),          # duplicate stem in doc
        ("c2", 3, ""),
    ]
    corpus = str(tmp / "turns")
    import os

    os.makedirs(corpus)
    pq.write_table(
        pa.Table.from_pylist(
            [{"conv_id": c, "turn_idx": t, "text": x} for c, t, x in rows]
        ),
        f"{corpus}/part-0.parquet",
    )
    idx = str(tmp / "idx")
    build_index(corpus, idx, BuildConfig(num_partitions=1, term_parts=2, salt_bits=1))
    return idx, ThemisOracle(rows), rows


PHRASES = [
    "alpha beta",            # matches c0:0, c0:2, c2:2
    "beta gamma",
    "state of the art",      # stopword-slot phrase
    "running quickly",
    "alpha beta gamma delta",
    "gamma alpha",           # no doc has this order
    "alpha zzznope",         # unknown stem -> empty
    "the of",                # stopword-only -> empty
    "alpha",                 # single-term phrase == term match
]


def test_phrase_engine_matches_oracle(built):
    idx, oracle, _ = built
    eng = LocalSearchEngine(idx)
    for q in PHRASES:
        got = eng.search_phrase(q, k=10)
        want = oracle.search_phrase(q, k=10)
        assert [(h.conv_id, h.turn_idx) for h in got] == [
            (h.conv_id, h.turn_idx) for h in want
        ], q
        np.testing.assert_array_equal(
            np.array([h.score for h in got]), np.array([h.score for h in want])
        )


def test_phrase_semantics(built):
    _, oracle, _ = built
    hits = {(h.conv_id, h.turn_idx) for h in oracle.search_phrase("alpha beta", k=10)}
    assert hits == {("c0", 0), ("c0", 2), ("c2", 2)}
    # stopword slots: "state of the art" requires art exactly 3 after state
    hits = {(h.conv_id, h.turn_idx) for h in oracle.search_phrase("state of the art")}
    assert hits == {("c1", 0), ("c1", 2)}
    assert ("c1", 1) not in hits  # adjacent but wrong slot distance
    # stemming: "running quickly" stems run/quickli... both docs match iff stems align
    got = {(h.conv_id, h.turn_idx) for h in oracle.search_phrase("running quickly")}
    assert ("c2", 0) in got


def test_phrase_actor_engine(built, ray_session):
    idx, oracle, _ = built
    eng = SearchEngine(idx)
    try:
        for q in PHRASES[:4]:
            got = eng.search_phrase(q, k=5)
            want = oracle.search_phrase(q, k=5)
            assert [(h.conv_id, h.turn_idx, h.score) for h in got] == [
                (h.conv_id, h.turn_idx, h.score) for h in want
            ], q
    finally:
        eng.close()
