"""Query-expansion actor stages (SURVEY M10/M11).

Reference behavior (`/root/reference`, ``themis/queryExpansion/``):

* **WordNet/EXTJWNL** (``EXTJWNL.java:53-116``): per query, build the
  set of unique tokens (count = C); POS-tag; for nouns/verbs/adjs/advs
  collect all synset lemma tokens not already seen; then emit up to
  C+1 words from the set (HashSet order — nondeterministic) followed by
  the original query string.
* **GloVe** (``Glove.java:20-55``): per query, append the deduped
  nearest-1 embedding neighbor of each token to the original query.
  The reference reloads the GloVe model for EVERY token (pathological);
  here the model loads once per actor in ``__init__``.

Neither WordNet, a POS tagger, nor GloVe vectors exist in this
container, so the *models* are deterministic stubs (clearly marked);
the Ray-side plumbing — callable classes for
``map_batches(cls, concurrency=N)``, one model load per actor, batch
schema (qid, query) → (qid, query, expanded) — is real and tested.
Swapping a stub for a real model is a constructor argument.

Determinism divergence (documented): the reference's HashSet iteration
order is nondeterministic; we emit candidate words in insertion order
(original tokens first, then synonyms in token order).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class StubSynonymLexicon:
    """Deterministic stand-in for WordNet + the Stanford POS tagger.

    ``synonyms(token)`` returns up to ``n_senses`` synthetic lemmas
    derived from a stable hash — the shape of real synset output
    (multi-word lemmas included) without the lexicon. Replace with a
    real WordNet-backed lexicon by passing any object with the same
    method to :class:`WordNetExpander`.
    """

    def __init__(self, n_senses: int = 2):
        self.n_senses = n_senses

    def is_content_word(self, token: str) -> bool:
        # stands in for the POS filter (noun/verb/adj/adv — EXTJWNL
        # getPos); deterministic pseudo-POS from the token hash.
        # md5 (not blake2b): DuckDB has md5(), so the whole stub is
        # replicable in SQL and the lexicon/actor machinery gets a
        # value-exact driver entry (wordnet_synonyms)
        return int(hashlib.md5(token.encode()).hexdigest()[:2], 16) % 4 != 3

    def synonyms(self, token: str) -> list[str]:
        if not self.is_content_word(token):
            return []
        out = []
        for i in range(self.n_senses):
            h = hashlib.md5(f"{token}|{i}".encode()).hexdigest()
            # every other sense is a two-word lemma, like WordNet collocations
            out.append(f"{token}{h[:3]}" if i % 2 == 0 else f"{token} {h[:3]}")
        return out


class DistributionalLexicon:
    """Corpus-derived synonym source for :class:`WordNetExpander` — a
    REAL trained model standing in for WordNet synsets (which need the
    WordNet DB, absent from this container). ``synonyms(token)`` returns
    the token's nearest neighbors in a :class:`CorpusEmbeddingModel`
    (pipelines/embeddings_train.py: PPMI-SVD over the corpus) above a
    cosine floor — distributional synonymy instead of curated synsets;
    the expander semantics (dedup, C+1 cap, re-tokenization) are
    unchanged."""

    def __init__(self, model, n_synonyms: int = 2, min_cosine: float = 0.35):
        self.model = model
        self.n_synonyms = n_synonyms
        self.min_cosine = min_cosine

    def synonyms(self, token: str) -> list[str]:
        i = self.model.index.get(token)
        if i is None:
            return []
        import numpy as np

        sims = self.model.matrix @ self.model.matrix[i]
        sims[i] = -np.inf
        top = np.argsort(-sims, kind="stable")[: self.n_synonyms]
        return [
            self.model.vocab[int(j)] for j in top if sims[j] >= self.min_cosine
        ]


class WordNetExpander:
    """``map_batches`` actor stage replicating EXTJWNL.extendQuery.

    Batch in: (qid, query) → out: (qid, query, expanded). Lexicon is
    constructed ONCE per actor (T4 state — the reference loads the
    WordNet dictionary + MaxentTagger per call)."""

    def __init__(self, lexicon=None):
        self.lexicon = lexicon if lexicon is not None else StubSynonymLexicon()

    def expand_one(self, query: str) -> str:
        words_seen: dict[str, None] = {}  # insertion-ordered set
        raw_tokens = query.split()
        for t in raw_tokens:
            words_seen.setdefault(t, None)
        counter_of_tokens = len(words_seen)
        for t in raw_tokens:
            for lemma in self.lexicon.synonyms(t):
                if lemma not in words_seen:
                    # multi-word lemmas are re-tokenized (EXTJWNL:95-101)
                    for part in lemma.split():
                        words_seen.setdefault(part, None)
        added = []
        # "up to counter_of_tokens+1 words" incl. original tokens
        # (EXTJWNL:107-112: the cap counts everything it emits)
        for w in words_seen:
            if len(added) > counter_of_tokens:
                break
            added.append(w)
        return " ".join(added) + " " + query

    def __call__(self, batch: pa.Table) -> pa.Table:
        queries = batch["query"].to_pylist()
        expanded = [self.expand_one(q if q else "") for q in queries]
        return pa.Table.from_arrays(
            [batch["qid"], batch["query"], pa.array(expanded, pa.string())],
            names=["qid", "query", "expanded"],
        )


class StubEmbeddingModel:
    """Deterministic stand-in for a GloVe word-vector model: a fixed
    vocabulary with hash-seeded unit vectors. Real math (normalized
    matmul nearest-neighbor), fake data. Swap for real vectors by
    passing (vocab, matrix) to :class:`GloveExpander`."""

    def __init__(self, vocab: list[str], dim: int = 16):
        self.vocab = list(vocab)
        mats = []
        for w in self.vocab:
            seed = int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"
            )
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(dim)
            mats.append(v / np.linalg.norm(v))
        self.matrix = np.asarray(mats)  # (V, dim), rows unit-norm
        self.index = {w: i for i, w in enumerate(self.vocab)}

    def vectors(self, tokens: list[str]) -> tuple[np.ndarray, list[int]]:
        rows = [self.index[t] for t in tokens if t in self.index]
        return self.matrix[rows], rows

    def nearest(self, token: str) -> str | None:
        """Nearest vocabulary word by cosine, excluding the token itself
        (``model.wordsNearest(term, 1)``)."""
        i = self.index.get(token)
        if i is None:
            return None
        sims = self.matrix @ self.matrix[i]
        sims[i] = -np.inf
        return self.vocab[int(np.argmax(sims))]


class GloveExpander:
    """``map_batches`` actor stage replicating Glove.extendQuery with the
    model loaded once per actor instead of once per token."""

    def __init__(self, model=None, vocab: list[str] | None = None):
        if model is None:
            model = StubEmbeddingModel(vocab or [])
        self.model = model

    def expand_one(self, query: str) -> str:
        neighbors: dict[str, None] = {}
        for t in query.split():
            n = self.model.nearest(t)
            if n is not None:
                neighbors.setdefault(n, None)
        out = query
        for n in neighbors:
            out += " " + n
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        queries = batch["query"].to_pylist()
        expanded = [self.expand_one(q if q else "") for q in queries]
        return pa.Table.from_arrays(
            [batch["qid"], batch["query"], pa.array(expanded, pa.string())],
            names=["qid", "query", "expanded"],
        )


def expand_queries(queries: list[str], expander_cls=WordNetExpander, concurrency: int = 2, **kw):
    """Batch query expansion through an actor pool: the Ray-Data-native
    equivalent of Search.java:75 expanding all queries up front."""
    import ray.data as rd

    ds = rd.from_items([{"qid": i, "query": q} for i, q in enumerate(queries)])
    return ds.map_batches(
        expander_cls,
        fn_constructor_kwargs=kw,
        concurrency=min(concurrency, max(1, len(queries))),
        batch_size=max(1, len(queries) // max(1, concurrency)),
        batch_format="pyarrow",
    )


class VocabularyExpander:
    """``map_batches`` actor stage mapping distinct corpus terms to
    their lexicon synonyms: (term) → (term, sense, synonym) rows,
    non-content words dropped. The lexicon is constructed once per
    actor (T4 state), exactly like :class:`WordNetExpander`."""

    def __init__(self, lexicon=None):
        self.lexicon = lexicon if lexicon is not None else StubSynonymLexicon()

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms, senses, syns = [], [], []
        for t in batch["term"].to_pylist():
            for i, s in enumerate(self.lexicon.synonyms(t or "")):
                terms.append(t)
                senses.append(i)
                syns.append(s)
        return pa.Table.from_arrays(
            [
                pa.array(terms, pa.string()),
                pa.array(senses, pa.int64()),
                pa.array(syns, pa.string()),
            ],
            names=["term", "sense", "synonym"],
        )


def wordnet_synonyms(sf_dir: str, concurrency: int = 2):
    """Corpus-vocabulary expansion through the actor-pool lexicon —
    the M10 machinery with a driver-verifiable surface: (term, sense,
    synonym) for every distinct [a-z0-9]+ token of the lowered corpus
    that the pseudo-POS filter admits. One pruned pass emits per-batch
    unique terms, a bounded ``groupby(term)`` dedupes globally, the
    actor pool maps terms to synonyms. The stub lexicon derives from
    md5, so a DuckDB oracle replicates every row; the composed-query
    semantics (EXTJWNL word-cap quirks) stay pytest-golden in
    test_expansion."""
    import ray.data as rd

    from ..stages.tokenize import token_codes_batch

    def batch_terms(batch: pa.Table) -> pa.Table:
        uniq, _codes, _lens, _n = token_codes_batch(
            batch["text"], lower_first=True
        )
        terms = [t for t in uniq if t]
        return pa.Table.from_pydict({"term": pa.array(terms, pa.string())})

    terms = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(batch_terms, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .count()
        .select_columns(["term"])
    )
    return terms.map_batches(
        VocabularyExpander,
        concurrency=concurrency,
        batch_size=4096,
        batch_format="pyarrow",
    )
