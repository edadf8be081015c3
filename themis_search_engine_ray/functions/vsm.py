"""VSM (cosine) math shared by the Ray engine and the oracle.

Semantics from the reference's VSM paths (`/root/reference`, Java root
``themis/`` = ``src/main/java/gr/csd/uoc/hy463/themis/``):

* idf = log2(N / df) with **Java integer division** ``N/df`` — this is
  how the doc-norm builder computes it (``themis/indexer/
  Indexer.java:763-769``) and how the top-k VSM query path computes it
  (``themis/retrieval/models/VSM.java:299-301``). The no-topk VSM path
  uses double division (``VSM.java:91``); we standardize on the integer
  division everywhere so query weights and the stored norms agree.
* doc weight  w_d(t,d) = tf_norm(t,d) · idf_int(t)   (``VSM.java:126-158``)
* doc norm    norm_d = sqrt(Σ_t w_d(t,d)²) over ALL stems of d, built at
  index time with global df (``Indexer.java:674-761``).
* query weight w_q(t) = (qtf_t / max_qtf) · idf_int(t)
  (``themis/ui/Search.java:169-199`` builds qtf/maxfreq; ``VSM.java:87-94``
  multiplies by idf).
* query norm = sqrt(Σ over ALL query stems of weight²) where stems
  missing from the vocabulary keep their raw qtf/maxfreq weight —
  ``VSM.java:186-192`` iterates the full QueryTerm list whose weights
  were only rescaled for known terms (``VSM.java:84-99``). Replicated.
* score(d) = Σ_{t ∈ q ∩ d} w_q(t)·w_d(t,d) / (norm_d · query_norm)
  (``VSM.java:236-254``).
* Divergence (documented): when the denominator is 0 (all idfs zero)
  Java yields NaN scores and an undefined sort (``VSM.java:258-269``
  comparator returns 0 for NaN); we define score = 0.0 so ranking stays
  deterministic under the canonical tie-break (score desc, conv asc,
  turn asc).
"""

from __future__ import annotations

import math

_LOG2 = math.log(2.0)


def idf_int(n_docs: int, df: int) -> float:
    """log2(N // df): Java int division then log (Indexer.java:766)."""
    return math.log(n_docs // df) / _LOG2


def doc_weight(tf_norm, term_idf: float):
    """w_d = stored tf · idf (scalar or numpy)."""
    return tf_norm * term_idf


def cosine(numerator: float, doc_norm: float, query_norm: float) -> float:
    denom = doc_norm * query_norm
    return numerator / denom if denom != 0.0 else 0.0
