"""Hypothesis property tests for the pure kernels behind the
session-4/5 operators — histogram order statistics, bottom-k
semilattices, and PMI/overlap references — no Ray session needed."""

import hashlib
import math
import re
from collections import Counter, defaultdict

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

_INTS = st.lists(st.integers(0, 50), min_size=1, max_size=200)
_Q = st.floats(0.0, 1.0, allow_nan=False)


def _hist_order_stat(values, q):
    """length_filter's histogram quantile, fed from raw values."""
    from themis_search_engine_ray.pipelines.text_analysis import hist_order_stat

    vals, cnts = np.unique(np.asarray(values, np.int64), return_counts=True)
    return hist_order_stat(vals, np.cumsum(cnts), q)


@settings(max_examples=300, deadline=None)
@given(_INTS, _Q)
def test_histogram_quantile_equals_sorted_expansion(values, q):
    """The histogram order statistic is BIT-equal to quantile_cont
    over the fully expanded sorted multiset (what DuckDB computes)."""
    from themis_search_engine_ray.pipelines.sampling import _quantile_cont

    expanded = np.sort(np.asarray(values, np.float64))
    assert _hist_order_stat(values, q) == _quantile_cont(expanded, q)


_ID_SETS = st.lists(st.integers(0, 10_000), min_size=0, max_size=80)


def _bottomk(ids, k):
    return sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i) for i in set(ids)
    )[:k]


@settings(max_examples=200, deadline=None)
@given(_ID_SETS, _ID_SETS, st.integers(1, 20))
def test_bottomk_merge_is_associative(a, b, k):
    """bottomk(bottomk(A) ∪ bottomk(B)) == bottomk(A ∪ B): the partial
    each batch emits loses nothing (sample_exact_k's contract)."""
    merged = sorted(set(_bottomk(a, k)) | set(_bottomk(b, k)))[:k]
    assert merged == _bottomk(a + b, k)


_TOKS = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "x1"]), min_size=0, max_size=25
)
_CORPUS = st.lists(_TOKS.map(" ".join), min_size=1, max_size=10)


@settings(max_examples=200, deadline=None)
@given(_CORPUS, st.integers(1, 4))
def test_pmi_counts_split_invariant(texts, min_count):
    """Splitting the corpus into per-doc 'batches' and summing the
    per-batch distinct (w1, w2, count) emissions equals the global
    bigram/unigram counts — the property collocations_pmi's one-groupby
    shape relies on."""
    uni_g, big_g = Counter(), Counter()
    for t in texts:
        ws = re.findall(r"[a-z0-9]+", t.lower())
        uni_g.update(ws)
        big_g.update(zip(ws, ws[1:]))
    uni_s, big_s = Counter(), Counter()
    for t in texts:  # one "batch" per doc: worst-case fragmentation
        ws = re.findall(r"[a-z0-9]+", t.lower())
        uni_s.update(Counter(ws))
        big_s.update(Counter(zip(ws, ws[1:])))
    assert uni_s == uni_g and big_s == big_g
    # and the PMI expression is well-defined for every surviving pair
    n_u, n_b = sum(uni_g.values()), sum(big_g.values())
    for (a, b), c in big_g.items():
        if c >= min_count:
            assert math.isfinite(
                math.log((c / n_b) / ((uni_g[a] / n_u) * (uni_g[b] / n_u)))
            )


_SRC = st.sampled_from(["s1", "s2", "s3"])


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(_TOKS.map(" ".join), _SRC), min_size=1, max_size=12))
def test_overlap_diagonal_dominates(rows):
    """In any corpus, n_shared(a, b) <= min(n_shared(a, a),
    n_shared(b, b)) — the sanity invariant of the overlap matrix — and
    the per-(shingle, source) dedup makes repeated docs idempotent."""
    by_src = defaultdict(set)
    for t, s in rows:
        toks = re.findall(r"[a-z0-9]+", t.lower())
        by_src[s].update(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )
    dup = defaultdict(set)
    for t, s in rows + rows:  # every doc twice
        toks = re.findall(r"[a-z0-9]+", t.lower())
        dup[s].update(" ".join(toks[i : i + 3]) for i in range(len(toks) - 2))
    assert dup == by_src
    srcs = sorted(by_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            shared = len(by_src[a] & by_src[b])
            assert shared <= min(len(by_src[a]), len(by_src[b]))
