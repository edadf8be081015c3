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

from .functions.analyzer import AnalyzerConfig, DEFAULT_CONFIG, analyze_doc, analyze_query
from .functions.bm25 import idf as bm25_idf
from .functions.bm25 import term_score


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

    def search(self, query: str, k: int | None = None) -> list[OracleHit]:
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
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if k is not None:
            ranked = ranked[: min(k, len(ranked))]  # min() guard replaces the
            # reference's index-out-of-bounds crash when k > |results|
            # (OkapiBM25.java:305-309).
        return [OracleHit(conv_id=c, turn_idx=ti, score=s) for (c, ti), s in ranked]
