"""Oracle unit tests: closed-form BM25 on a tiny corpus (SURVEY §5.2 item 2)."""

import math

from themis_search_engine_ray.functions.analyzer import AnalyzerConfig
from themis_search_engine_ray.oracle import ThemisOracle

TURNS = [
    ("conv-a", 0, "the cat sat on the mat"),
    ("conv-a", 1, "a cat and a dog"),
    ("conv-b", 0, "dogs dogs dogs barking"),
    ("conv-b", 1, "quantum flux capacitor"),
    ("conv-c", 0, ""),
]


def test_oracle_stats():
    o = ThemisOracle(TURNS)
    assert o.n_docs == 5
    # dls: doc0: cat,sat,mat -> 3 ; doc1: cat,dog -> 2 ; doc2: dogs*3+barking -> 4
    # doc3: 3 ; doc4: 0
    assert o.dl[("conv-a", 0)] == 3
    assert o.dl[("conv-a", 1)] == 2
    assert o.dl[("conv-b", 0)] == 4
    assert o.dl[("conv-b", 1)] == 3
    assert o.dl[("conv-c", 0)] == 0
    assert o.avgdl == 12 / 5
    # "dogs" and "dog" both stem to "dog": df counts docs, not occurrences
    assert o.df("dog") == 2
    assert o.df("cat") == 2
    assert o.df("nonexistent") == 0


def test_oracle_closed_form_score():
    o = ThemisOracle(TURNS)
    hits = o.search("cat", k=10)
    assert [(h.conv_id, h.turn_idx) for h in hits] == [("conv-a", 1), ("conv-a", 0)]
    idf = math.log((5 - 2 + 0.5) / (2 + 0.5)) / math.log(2)
    # doc ("conv-a",1): tf stored = 1/1 = 1.0, dl=2
    tf, dl = 1.0, 2
    expect = idf * (tf * 3.0) / (tf + 2.0 * (1 - 0.75 + (0.75 * (dl / o.avgdl))))
    assert abs(hits[0].score - expect) < 1e-12


def test_oracle_or_semantics_and_ties():
    o = ThemisOracle(TURNS)
    hits = o.search("cat dog")
    keys = {(h.conv_id, h.turn_idx) for h in hits}
    assert keys == {("conv-a", 0), ("conv-a", 1), ("conv-b", 0)}
    # k > matches: min() guard, no crash
    assert len(o.search("quantum", k=50)) == 1


def test_oracle_unknown_and_stopword_queries():
    o = ThemisOracle(TURNS)
    assert o.search("zzzz unknown") == []
    assert o.search("the and of") == []


def test_oracle_negative_idf_kept():
    # term in 4 of 5 docs -> df > N/2 -> negative idf; doc still scored.
    turns = [(f"c{i}", 0, "common stuff" if i < 4 else "rare") for i in range(5)]
    o = ThemisOracle(turns)
    hits = o.search("common")
    assert len(hits) == 4
    assert all(h.score < 0 for h in hits)
    # deterministic tie-break: equal scores -> conv_id asc
    assert [h.conv_id for h in hits] == ["c0", "c1", "c2", "c3"]


def test_oracle_respects_config():
    o = ThemisOracle(TURNS, AnalyzerConfig(use_stemmer=False))
    assert o.df("dogs") == 1
    assert o.df("dog") == 1
