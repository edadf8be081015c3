"""Single-process Themis-semantics oracle (the conformance judge).

A deliberately simple, dictionary-based reimplementation of the
reference's index build + BM25 ranking (``themis/indexer/Indexer.java``
build loop + ``themis/retrieval/models/OkapiBM25.java`` top-k path in
/root/reference), quirks included via the shared
:mod:`themis_search_engine_ray.functions.analyzer` and
:mod:`themis_search_engine_ray.functions.bm25`. The Ray Data engine must
be rank-identical to this oracle with bit-equal scores (tests allow
1e-9 relative tolerance as a backstop).

Determinism contract shared with the engine:

* doc identity = (conv_id, turn_idx);
* score accumulation per doc iterates query stems in ascending order;
* tie-break = (score desc, conv_id asc, turn_idx asc).
"""

from __future__ import annotations

from dataclasses import dataclass

from .functions.analyzer import (
    AnalyzerConfig,
    DEFAULT_CONFIG,
    analyze_doc,
    analyze_query,
    analyze_query_weighted,
)
from .functions.bm25 import idf as bm25_idf
from .functions.bm25 import term_score
from .functions.vsm import cosine, idf_int


@dataclass
class OracleHit:
    conv_id: str
    turn_idx: int
    score: float


class ThemisOracle:
    """In-memory inverted index + BM25 over a list of turns."""

    def __init__(self, turns, config: AnalyzerConfig = DEFAULT_CONFIG):
        """``turns``: iterable of (conv_id, turn_idx, text)."""
        self.config = config
        self.postings: dict[str, dict[tuple[str, int], float]] = {}
        self.positions: dict[str, dict[tuple[str, int], list[int]]] = {}
        self.dl: dict[tuple[str, int], int] = {}
        sum_dl = 0
        n = 0
        for conv_id, turn_idx, text in turns:
            key = (conv_id, int(turn_idx))
            doc = analyze_doc(text if text is not None else "", config)
            for stem, tf in doc.tfs.items():
                self.postings.setdefault(stem, {})[key] = tf
                self.positions.setdefault(stem, {})[key] = doc.positions[stem]
            self.dl[key] = doc.dl
            sum_dl += doc.dl
            n += 1
        self.n_docs = n
        # averageLength = sumForAverageLength / totalNumofArticles
        # (Indexer.java:472) — a plain double division.
        self.avgdl = sum_dl / n if n else 0.0

    def df(self, stem: str) -> int:
        return len(self.postings.get(stem, ()))

    def search(
        self, query: str, k: int | None = None, abs_scores: bool = False
    ) -> list[OracleHit]:
        """``abs_scores=True`` replicates the reference's *no-topk* BM25
        path, which wraps the accumulated score in ``Math.abs``
        (OkapiBM25.java:167 — flips negative-idf docs; K5 quirk). The
        canonical top-k path (default) does not."""
        terms = analyze_query(query, self.config)
        scores: dict[tuple[str, int], float] = {}
        for t in terms:  # ascending stem order == engine accumulation order
            plist = self.postings.get(t)
            if not plist:
                continue  # unknown terms are skipped (OkapiBM25.java:222)
            t_idf = bm25_idf(float(self.n_docs), len(plist))
            for key, tf in plist.items():
                part = term_score(tf, self.dl[key], self.avgdl, t_idf)
                scores[key] = scores.get(key, 0.0) + part
        if abs_scores:
            scores = {key: abs(s) for key, s in scores.items()}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if k is not None:
            ranked = ranked[: min(k, len(ranked))]  # min() guard replaces the
            # reference's index-out-of-bounds crash when k > |results|
            # (OkapiBM25.java:305-309).
        return [OracleHit(conv_id=c, turn_idx=ti, score=s) for (c, ti), s in ranked]

    # -------------------------------------------------------- phrase

    def search_phrase(self, query: str, k: int | None = None) -> list[OracleHit]:
        """Exact-phrase retrieval over the positional index (an extension
        beyond the reference, whose postings carry no positions —
        ``themis/indexer/indexes/Index.java:106-110``): a doc matches iff
        every phrase stem occurs at its query token-offset relative to a
        common base position (stopword slots preserved). Matching docs
        are BM25-scored over the phrase's unique stems and ranked with
        the canonical tie-break."""
        from .functions.analyzer import analyze_phrase_query

        terms = analyze_phrase_query(query, self.config)
        if not terms:
            return []
        base_stem, base_off = terms[0]
        plist0 = self.positions.get(base_stem)
        if plist0 is None:
            return []
        matches: list[tuple[str, int]] = []
        for key, pos0 in plist0.items():
            bases = set(pos0)
            ok = True
            for stem, off in terms[1:]:
                pos_i = self.positions.get(stem, {}).get(key)
                if pos_i is None:
                    ok = False
                    break
                delta = off - base_off
                bases &= {p - delta for p in pos_i}
                if not bases:
                    ok = False
                    break
            if ok:
                matches.append(key)
        # BM25 score over the unique stems, ascending order (canonical)
        stems = sorted({s for s, _ in terms})
        scores: dict[tuple[str, int], float] = {}
        for s in stems:
            plist = self.postings.get(s)
            if not plist:
                continue
            t_idf = bm25_idf(float(self.n_docs), len(plist))
            for key in matches:
                tf = plist.get(key)
                if tf is not None:
                    scores[key] = scores.get(key, 0.0) + term_score(
                        tf, self.dl[key], self.avgdl, t_idf
                    )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if k is not None:
            ranked = ranked[: min(k, len(ranked))]
        return [OracleHit(conv_id=c, turn_idx=ti, score=s) for (c, ti), s in ranked]

    # ----------------------------------------------------------- VSM

    def doc_norms(self) -> dict[tuple[str, int], float]:
        """VSM doc norms (A4, Indexer.java:674-761): per doc
        sqrt(Σ (tf·idf_int)²) over its stems, ascending stem order."""
        import math

        if not hasattr(self, "_norms"):
            w2: dict[tuple[str, int], float] = {}
            for stem in sorted(self.postings):
                t_idf = idf_int(self.n_docs, len(self.postings[stem]))
                for key, tf in self.postings[stem].items():
                    w = tf * t_idf
                    w2[key] = w2.get(key, 0.0) + w * w
            self._norms = {key: math.sqrt(v) for key, v in w2.items()}
        return self._norms

    def search_vsm(self, query: str, k: int | None = None) -> list[OracleHit]:
        """VSM cosine ranking (VSM.java:54-437 with the quirks spelled out
        in functions/vsm.py). Scores use float64 with 1e-9 rel-tol parity
        vs the engine (norm accumulation order differs)."""
        import math

        qweights = analyze_query_weighted(query, self.config)
        norms = self.doc_norms()
        # query norm over ALL stems: unknown ones keep the raw qtf weight
        qn2 = 0.0
        weights: dict[str, float] = {}
        for s in sorted(qweights):
            plist = self.postings.get(s)
            if plist:
                w = qweights[s] * idf_int(self.n_docs, len(plist))
                weights[s] = w
            else:
                w = qweights[s]
            qn2 += w * w
        qnorm = math.sqrt(qn2)
        scores: dict[tuple[str, int], float] = {}
        for s in sorted(weights):
            t_idf = idf_int(self.n_docs, len(self.postings[s]))
            wq = weights[s]
            for key, tf in self.postings[s].items():
                scores[key] = scores.get(key, 0.0) + (tf * t_idf) * wq
        ranked = sorted(
            ((key, cosine(num, norms[key], qnorm)) for key, num in scores.items()),
            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]),
        )
        if k is not None:
            ranked = ranked[: min(k, len(ranked))]
        return [OracleHit(conv_id=c, turn_idx=ti, score=s) for (c, ti), s in ranked]

    # --------------------------------------------------- Existential

    def search_existential(self, query: str, k: int | None = None) -> list[OracleHit]:
        """Boolean OR, every matching doc scored 1.0
        (Existential.java:48-131). Divergence (documented): the reference
        emits one row per (term, doc) match in insertion order — we
        dedupe to distinct docs and order by (conv_id, turn_idx)."""
        hits: set[tuple[str, int]] = set()
        for t in analyze_query(query, self.config):
            hits.update(self.postings.get(t, ()))
        ranked = sorted(hits)
        if k is not None:
            ranked = ranked[: min(k, len(ranked))]
        return [OracleHit(conv_id=c, turn_idx=ti, score=1.0) for c, ti in ranked]
