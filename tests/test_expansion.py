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


def test_corpus_trained_embeddings(ray_session, tmp_path):
    """M11 with a REAL model: PPMI-SVD vectors trained on the corpus
    itself. Tokens that co-occur almost exclusively with each other must
    be mutual nearest neighbors; the model is corpus-derived (vocab from
    the corpus), deterministic, and plugs into GloveExpander."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from themis_search_engine_ray.pipelines.embeddings_train import (
        train_corpus_embeddings,
    )

    d = tmp_path / "corpus"
    d.mkdir()
    rows = []
    # two disjoint co-occurrence cliques + noise
    for i in range(120):
        rows.append({"text": f"zork blivet zork blivet prattle{i % 7}"})
        rows.append({"text": f"quux fnord quux fnord mumble{i % 5}"})
    pq.write_table(pa.Table.from_pylist(rows), str(d / "part-0.parquet"))

    model = train_corpus_embeddings(str(d), vocab_size=64, dim=8, min_count=2)
    assert set(model.vocab) >= {"zork", "blivet", "quux", "fnord"}
    assert model.nearest("zork") == "blivet"
    assert model.nearest("blivet") == "zork"
    assert model.nearest("quux") == "fnord"
    assert model.nearest("fnord") == "quux"
    assert model.nearest("notinvocab") is None

    # deterministic retrain
    model2 = train_corpus_embeddings(str(d), vocab_size=64, dim=8, min_count=2)
    assert model2.vocab == model.vocab
    np.testing.assert_allclose(model2.matrix, model.matrix)

    # plugs into the M11 expander (one model per actor)
    exp = GloveExpander(model=model)
    out = exp.expand_one("zork quux")
    assert out.startswith("zork quux")
    assert "blivet" in out and "fnord" in out


def test_distributional_lexicon(ray_session, tmp_path):
    """M10 with a corpus-derived model: WordNetExpander over a
    DistributionalLexicon built from PPMI-SVD vectors — synonyms are
    real nearest neighbors, and the expander contract (cap, dedup,
    original-query suffix) holds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from themis_search_engine_ray.pipelines.embeddings_train import (
        train_corpus_embeddings,
    )
    from themis_search_engine_ray.stages.expansion import DistributionalLexicon

    d = tmp_path / "corpus"
    d.mkdir()
    rows = []
    for i in range(150):
        rows.append({"text": f"zork blivet zork blivet filler{i % 6}"})
        rows.append({"text": f"quux fnord quux fnord pad{i % 4}"})
    pq.write_table(pa.Table.from_pylist(rows), str(d / "part-0.parquet"))
    model = train_corpus_embeddings(str(d), vocab_size=64, dim=8, min_count=2)

    lex = DistributionalLexicon(model, n_synonyms=1)
    assert lex.synonyms("zork") == ["blivet"]
    assert lex.synonyms("unknowntok") == []

    exp = WordNetExpander(lexicon=lex)
    out = exp.expand_one("zork")
    assert out.endswith(" zork")
    prefix = out[: -len(" zork")].split()
    assert prefix == ["zork", "blivet"]  # C+1 = 2 words, insertion order


def test_default_query_expander_is_distributional(ray_session, tmp_path):
    """The documented M10 default (default_query_expander) trains the
    real corpus model and expands with distributional synonyms; the
    WordNet adapter stays a plug (any synonyms() object), covered by
    the loopback lexicon in test_wordnet_multiword_lemma_split."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from themis_search_engine_ray.pipelines.embeddings_train import (
        default_query_expander,
    )
    from themis_search_engine_ray.stages.expansion import (
        DistributionalLexicon,
        WordNetExpander,
        expand_queries,
    )

    d = tmp_path / "corpus"
    d.mkdir()
    rows = []
    for i in range(150):
        rows.append({"text": f"zork blivet zork blivet filler{i % 6}"})
        rows.append({"text": f"quux fnord quux fnord pad{i % 4}"})
    pq.write_table(pa.Table.from_pylist(rows), str(d / "part-0.parquet"))

    exp = default_query_expander(
        str(d), n_synonyms=1, vocab_size=64, dim=8, min_count=2
    )
    assert isinstance(exp.lexicon, DistributionalLexicon)
    out = exp.expand_one("zork")
    assert out.endswith(" zork")
    assert out[: -len(" zork")].split() == ["zork", "blivet"]

    # actor-pool path: lexicon (model included) serialized once per actor
    res = expand_queries(
        ["zork", "quux"], WordNetExpander, lexicon=exp.lexicon
    ).to_pandas()
    got = dict(zip(res["query"], res["expanded"]))
    assert got["zork"].split()[:2] == ["zork", "blivet"]
    assert got["quux"].split()[:2] == ["quux", "fnord"]


def test_wordnet_synonyms_matches_scalar_lexicon(ray_session):
    """The distributed vocabulary expansion must equal the scalar stub
    lexicon applied to the corpus's distinct tokens."""
    import pyarrow.parquet as pq

    from themis_search_engine_ray.stages.expansion import (
        StubSynonymLexicon,
        wordnet_synonyms,
    )
    from themis_search_engine_ray.stages.tokenize import token_codes_batch

    sf = "/root/testdata/sf0.001"
    got = wordnet_synonyms(sf).to_pandas()
    tab = pq.read_table(f"{sf}/documents.parquet", columns=["text"])
    uniq, _, _, _ = token_codes_batch(tab["text"], lower_first=True)
    lex = StubSynonymLexicon()
    want = {
        (t, i, s)
        for t in set(uniq)
        if t
        for i, s in enumerate(lex.synonyms(t))
    }
    assert set(zip(got["term"], got["sense"], got["synonym"])) == want
    assert len(got) == len(want)  # no duplicate rows
