"""Query-expansion actor stages: EXTJWNL/GloVe semantics with stub
models, real actor-pool plumbing (one model load per actor)."""

import numpy as np

from themis_search_engine_ray.stages.expansion import (
    GloveExpander,
    StubEmbeddingModel,
    StubSynonymLexicon,
    WordNetExpander,
    expand_queries,
)


def test_wordnet_cap_and_suffix():
    exp = WordNetExpander()
    q = "search engine ranking"
    out = exp.expand_one(q)
    # original query appended verbatim (EXTJWNL:114)
    assert out.endswith(" " + q)
    prefix = out[: -(len(q) + 1)].split()
    # at most C+1 emitted words where C = unique token count
    assert len(prefix) <= 3 + 1
    # deterministic across calls and instances
    assert WordNetExpander().expand_one(q) == out


def test_wordnet_dedupes_tokens():
    out = WordNetExpander().expand_one("data data data")
    # C = 1 unique token -> at most 2 prefix words
    assert len(out.split()) <= 2 + 3


class _FixedLexicon:
    def synonyms(self, token):
        return {"car": ["automobile", "motor vehicle"]}.get(token, [])


def test_wordnet_multiword_lemma_split():
    out = WordNetExpander(lexicon=_FixedLexicon()).expand_one("car")
    prefix = out[: -len(" car")].split()
    # insertion order: original token, then lemma tokens, cap C+1 = 2
    assert prefix == ["car", "automobile"]


def test_glove_nearest_is_real_math():
    m = StubEmbeddingModel(["alpha", "beta", "gamma", "delta"])
    n = m.nearest("alpha")
    assert n in {"beta", "gamma", "delta"}
    # check vs explicit cosine argmax
    sims = m.matrix @ m.matrix[m.index["alpha"]]
    sims[m.index["alpha"]] = -np.inf
    assert n == m.vocab[int(np.argmax(sims))]
    assert m.nearest("unknowntok") is None


def test_glove_expander_appends_neighbors():
    vocab = ["alpha", "beta", "gamma"]
    exp = GloveExpander(vocab=vocab)
    out = exp.expand_one("alpha unknown beta")
    parts = out.split()
    assert parts[:3] == ["alpha", "unknown", "beta"]
    assert 3 < len(parts) <= 5  # ≤ one deduped neighbor per known token


def test_expand_queries_actor_pool(ray_session):
    queries = [f"query term{i} data" for i in range(8)]
    out = expand_queries(queries, WordNetExpander, concurrency=2).to_pandas()
    assert len(out) == 8
    got = dict(zip(out["qid"], out["expanded"]))
    exp = WordNetExpander()
    for i, q in enumerate(queries):
        assert got[i] == exp.expand_one(q)  # actor == local, deterministic

    out2 = expand_queries(
        queries, GloveExpander, concurrency=2, vocab=["data", "query", "term1"]
    ).to_pandas()
    assert len(out2) == 8
    assert all(e.startswith(q) for q, e in zip(out2["query"], out2["expanded"]))
