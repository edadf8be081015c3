"""Collocation mining (bigram PMI) and per-doc tf-idf keywords:
semantics vs pure-Python references on crafted corpora, including
empty docs, single-token docs (no bigram), min_count pruning, and
deterministic term tie-breaks in the top-k."""

import math
import re
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

from themis_search_engine_ray.pipelines import text_analysis as ta

_TOK = re.compile(r"[^a-zA-Z0-9]+")


def _write_docs(tmp_path, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def _toks(t):
    return [w for w in _TOK.sub(" ", t.lower()).split() if w]


def _pmi_reference(texts, min_count):
    uni, big = Counter(), Counter()
    for t in texts:
        ws = _toks(t)
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    n_u = float(sum(uni.values()))
    n_b = float(sum(big.values()))
    out = {}
    for (a, b), c in big.items():
        if c >= min_count:
            pmi = math.log((c / n_b) / ((uni[a] / n_u) * (uni[b] / n_u)))
            out[(a, b)] = (c, round(pmi, 6))
    return out


def test_collocations_pmi_matches_reference(ray_session, tmp_path):
    texts = (
        ["the quick brown fox jumps"] * 6
        + ["quick brown shoes, very quick"] * 3
        + ["", "fox!", "brown fox brown fox brown fox"]
    )
    sf = _write_docs(tmp_path, texts)
    got = ta.collocations_pmi(sf, min_count=5).to_pandas()
    ref = _pmi_reference(texts, 5)
    assert len(got) == len(ref)
    for r in got.itertuples():
        c, pmi = ref[(r.w1, r.w2)]
        assert r.pair_count == c
        assert r.pmi == pmi


def test_collocations_pmi_min_count_prunes(ray_session, tmp_path):
    sf = _write_docs(tmp_path, ["a b", "a b", "a c"])
    got = ta.collocations_pmi(sf, min_count=2).to_pandas()
    assert set(zip(got.w1, got.w2)) == {("a", "b")}
    # below threshold -> nothing survives
    assert ta.collocations_pmi(sf, min_count=3).to_pandas().empty


def test_collocations_pmi_empty_corpus(ray_session, tmp_path):
    """A 0-row documents table returns an empty typed result instead of
    crashing on Dataset.sum() -> None (regression)."""
    sf = _write_docs(tmp_path, [])
    got = ta.collocations_pmi(sf)
    assert got.count() == 0
    assert set(got.schema().names) == {"w1", "w2", "pair_count", "pmi"}


def _tfidf_reference(texts, k):
    n = float(len(texts))
    per_doc = [Counter(_toks(t)) for t in texts]
    df = Counter()
    for c in per_doc:
        df.update(c.keys())
    rows = []
    for d, c in enumerate(per_doc):
        scored = sorted(
            ((t, tf, tf * math.log(n / df[t])) for t, tf in c.items()),
            key=lambda x: (-x[2], x[0]),
        )[:k]
        rows.extend((d, t, tf, round(s, 6)) for t, tf, s in scored)
    return rows


def test_tfidf_keywords_matches_reference(ray_session, tmp_path):
    texts = [
        "apple banana apple cherry",
        "banana banana date",
        "",  # no tokens -> no rows
        "egg",  # single token
        "apple apple apple zebra zebra yak xray walrus very many terms",
    ]
    sf = _write_docs(tmp_path, texts)
    got = ta.tfidf_keywords(sf, k=3).to_pandas()
    got = got.sort_values(["doc_id", "term"]).reset_index(drop=True)
    ref = sorted(_tfidf_reference(texts, 3))
    assert [tuple(r) for r in got.itertuples(index=False)] == ref


def test_tfidf_keywords_tie_break_is_term_ascending(ray_session, tmp_path):
    # every term appears once in one doc: identical tf and df -> equal
    # scores; top-2 must be the lexicographically smallest terms
    sf = _write_docs(tmp_path, ["zeta alpha mid", "other words here"])
    got = ta.tfidf_keywords(sf, k=2).to_pandas()
    d0 = sorted(got[got.doc_id == 0].term)
    assert d0 == ["alpha", "mid"]
