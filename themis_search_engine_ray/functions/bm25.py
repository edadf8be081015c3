"""Okapi BM25 math, shared by the Ray engine and the pure-Python oracle.

Semantics from the reference's top-k scoring path
(``themis/retrieval/models/OkapiBM25.java:189-309`` in /root/reference):

* k1 = 2.0, b = 0.75 (OkapiBM25.java:191-192)
* idf = log2((N - df + 0.5) / (df + 0.5))  (OkapiBM25.java:226-229);
  negative idf for df > N/2 is kept, never clamped.
* score(d) = Σ_t idf_t · (tf·(k1+1)) / (tf + k1·(1 − b + b·(dl/avgdl)))
  (OkapiBM25.java:281-287) where tf is the *stored max-normalized* tf
  (see analyzer M7 quirks) and dl the non-stopword token count (M8).
* OR semantics: a doc is scored iff it matches ≥1 query term.
* The reference's no-topk path wraps the score in ``Math.abs``
  (OkapiBM25.java:167); the canonical top-k path does not — we follow
  the top-k path.
* Ties are left in HashMap order by the reference (nondeterministic,
  OkapiBM25.java:291-303); we define the deterministic tie-break
  (score desc, conv_id asc, turn_idx asc) used by engine, oracle and
  SQL oracles alike.

Both the scalar and the numpy paths below evaluate the exact same IEEE
operation sequence, so engine and oracle scores are bit-identical when
per-doc accumulation happens in the same term order (ascending stems —
see ``analyzer.analyze_query``).
"""

from __future__ import annotations

import math

K1 = 2.0
B = 0.75
_LOG2 = math.log(2.0)


def idf(n_docs: float, df: int) -> float:
    """log2((N - df + 0.5)/(df + 0.5)), computed as ln(x)/ln(2) like the
    reference (OkapiBM25.java:229: ``Math.log(num/den)/Math.log(2)``)."""
    return math.log((n_docs - df + 0.5) / (df + 0.5)) / _LOG2


def term_score(tf, dl, avgdl: float, term_idf: float):
    """Per-(term, doc) BM25 contribution.

    ``tf`` and ``dl`` may be scalars or numpy arrays (float64); the
    expression order mirrors OkapiBM25.java:282-285 exactly:
      numerator   = tf * (k+1)
      denominator = tf + k*(1 - b + (b * (dl / avgdl)))
      part        = idf * (numerator / denominator)
    """
    numerator = tf * (K1 + 1.0)
    denominator = tf + K1 * (1.0 - B + (B * (dl / avgdl)))
    return term_idf * (numerator / denominator)
