"""Corpus-trained word embeddings for query expansion (M11, real model).

The reference expands queries with pretrained GloVe vectors
(``themis/queryExpansion/Glove.java:20-55`` — ``wordsNearest(term, 1)``
per token). No pretrained vectors exist in this container, so this
module trains REAL vectors from the indexed corpus itself with
PPMI + truncated SVD (Levy & Goldberg 2014, "Neural Word Embedding as
Implicit Matrix Factorization" — count-based equivalent of SGNS):

1. **Vocabulary** (Ray): token counts over the corpus →
   ``groupby(term).sum`` → top ``vocab_size`` by (count desc, term asc).
2. **Co-occurrence** (Ray): per batch, symmetric ±``window`` sliding
   window over each turn's normalized token stream, counts
   pre-aggregated per batch (combiner) → ``groupby(a, b).sum``. The
   shuffle moves one row per distinct in-vocab pair per batch; the
   final aggregate is ≤ V² rows, sparse in practice.
3. **PPMI + SVD** (driver): the V×V PPMI matrix (V ≤ ``vocab_size``,
   default 4096 → ≤ 134 MB dense) is factorized with randomized
   truncated SVD (Halko, Martinsson & Tropp 2011, alg. 4.4/5.1 —
   numpy-only); vectors = U_d·√Σ_d, L2-normalized.

Scale notes: stages 1-2 are shuffle-light Ray pipelines over the full
corpus; stage 3 is driver-side on a V×V matrix, bounded by the vocab
cap, NOT the corpus (the standard count-based embedding shape — the
model itself must fit one machine to be broadcast to query actors
anyway). Tokenization matches the analyzer's normalized, stopword-
filtered, UNstemmed stream — the form query tokens take when the
expander sees them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.analyzer import STOPWORDS, tokenize


def _randomized_svd(
    m: np.ndarray, dim: int, n_oversample: int = 8, n_iter: int = 4, seed: int = 5
):
    """Truncated SVD of a (V, V) matrix via random projection + power
    iteration (Halko et al. 2011). Returns (U[:, :dim], s[:dim])."""
    rng = np.random.RandomState(seed)
    k = min(dim + n_oversample, m.shape[1])
    q = m @ rng.standard_normal((m.shape[1], k))
    q, _ = np.linalg.qr(q)
    for _ in range(n_iter):
        q, _ = np.linalg.qr(m.T @ q)
        q, _ = np.linalg.qr(m @ q)
    b = q.T @ m
    ub, s, _vt = np.linalg.svd(b, full_matrices=False)
    u = q @ ub
    return u[:, :dim], s[:dim]


class CorpusEmbeddingModel:
    """Word vectors with the same interface as the GloVe stand-in
    (vocab / matrix / index / vectors / nearest): rows L2-normalized,
    ``nearest`` = cosine argmax excluding the token itself."""

    def __init__(self, vocab: list[str], matrix: np.ndarray):
        self.vocab = list(vocab)
        norms = np.linalg.norm(matrix, axis=1)
        norms[norms == 0] = 1.0
        self.matrix = matrix / norms[:, None]
        self.index = {w: i for i, w in enumerate(self.vocab)}

    def vectors(self, tokens: list[str]) -> tuple[np.ndarray, list[int]]:
        rows = [self.index[t] for t in tokens if t in self.index]
        return self.matrix[rows], rows

    def nearest(self, token: str) -> str | None:
        i = self.index.get(token)
        if i is None:
            return None
        sims = self.matrix @ self.matrix[i]
        sims[i] = -np.inf
        return self.vocab[int(np.argmax(sims))]


def _norm_tokens(text: str) -> list[str]:
    return [t for t in tokenize(text or "") if t not in STOPWORDS]


def train_corpus_embeddings(
    input_path: str,
    text_col: str = "text",
    vocab_size: int = 4096,
    dim: int = 64,
    window: int = 5,
    min_count: int = 2,
) -> CorpusEmbeddingModel:
    """Train PPMI-SVD word vectors over a parquet corpus directory/file
    (any table with ``text_col``). Deterministic for a given corpus."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(input_path, columns=[text_col])

    # ---- stage 1: vocabulary (top-V by count desc, term asc) ----
    def term_counts(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch[text_col].to_pylist():
            for tok in _norm_tokens(t):
                counts[tok] = counts.get(tok, 0) + 1
        return pa.Table.from_pydict(
            {
                "term": pa.array(list(counts.keys()), pa.string()),
                "count": pa.array(list(counts.values()), pa.int64()),
            }
        )

    vocab_tab = (
        ds.map_batches(term_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("count", alias_name="count"))
        .sort(["count", "term"], descending=[True, False])
        .limit(vocab_size)
        .to_pandas()
    )
    vocab_tab = vocab_tab[vocab_tab["count"] >= min_count]
    vocab = vocab_tab["term"].tolist()
    term_count = vocab_tab["count"].to_numpy().astype(np.float64)
    V = len(vocab)
    if V == 0:
        return CorpusEmbeddingModel([], np.zeros((0, dim)))
    vindex = {w: i for i, w in enumerate(vocab)}

    # ---- stage 2: windowed co-occurrence (combiner + one groupby) ----
    def cooc_rows(batch: pa.Table) -> pa.Table:
        pair_counts: dict[int, int] = {}
        for t in batch[text_col].to_pylist():
            toks = _norm_tokens(t)
            ids = [vindex.get(x, -1) for x in toks]
            n = len(ids)
            for i, a in enumerate(ids):
                if a < 0:
                    continue
                for j in range(i + 1, min(i + 1 + window, n)):
                    b = ids[j]
                    if b < 0:
                        continue
                    key = a * V + b if a <= b else b * V + a
                    pair_counts[key] = pair_counts.get(key, 0) + 1
        return pa.Table.from_pydict(
            {
                "key": pa.array(list(pair_counts.keys()), pa.int64()),
                "n": pa.array(list(pair_counts.values()), pa.int64()),
            }
        )

    cooc = (
        ds.map_batches(cooc_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )

    # ---- stage 3: PPMI + randomized SVD (driver; V×V, bounded) ----
    keys = cooc["key"].to_numpy().astype(np.int64)
    counts = cooc["n"].to_numpy().astype(np.float64)
    ai = keys // V
    bi = keys % V
    m = np.zeros((V, V), np.float64)
    m[ai, bi] = counts
    off = ai != bi
    m[bi[off], ai[off]] = counts[off]  # symmetric
    total = m.sum()
    if total == 0:
        return CorpusEmbeddingModel(vocab, np.zeros((V, dim)))
    row_sums = m.sum(axis=1)
    row_sums[row_sums == 0] = 1.0
    with np.errstate(divide="ignore"):
        pmi = np.log(m * total / np.outer(row_sums, row_sums))
    ppmi = np.where(np.isfinite(pmi) & (pmi > 0), pmi, 0.0)
    u, s = _randomized_svd(ppmi, min(dim, V))
    vecs = u * np.sqrt(s)[None, :]
    if vecs.shape[1] < dim:
        vecs = np.pad(vecs, ((0, 0), (0, dim - vecs.shape[1])))
    return CorpusEmbeddingModel(vocab, vecs)


def default_query_expander(
    corpus_path: str,
    n_synonyms: int = 2,
    min_cosine: float = 0.35,
    **train_kw,
):
    """The DEFAULT M10 query expander: a :class:`WordNetExpander`
    (reference EXTJWNL.java:53-116 semantics — cap, dedup, multi-word
    lemma split, original-query suffix) whose synonym source is a
    :class:`DistributionalLexicon` over REAL corpus-trained PPMI-SVD
    vectors, not a stub. A true-WordNet dictionary stays an optional
    plug: pass any object with ``synonyms(token) -> list[str]`` to
    ``WordNetExpander(lexicon=...)`` (this container has no WordNet DB,
    so that adapter is exercised via a loopback lexicon in tests).

    The trained model is held by the returned expander instance; with
    ``expand_queries(queries, WordNetExpander, lexicon=expander.lexicon)``
    it is serialized once per actor (T4 state), never per batch."""
    from ..stages.expansion import DistributionalLexicon, WordNetExpander

    model = train_corpus_embeddings(corpus_path, **train_kw)
    return WordNetExpander(
        lexicon=DistributionalLexicon(
            model, n_synonyms=n_synonyms, min_cosine=min_cosine
        )
    )
