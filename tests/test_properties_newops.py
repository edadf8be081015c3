"""Hypothesis property tests for the pure-numpy kernels behind the
session-3 operators — no Ray session needed, hundreds of examples."""

import re

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from themis_search_engine_ray.pipelines import sampling, spans

_WORDS = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "x1", "y2"]),
    min_size=0,
    max_size=30,
)
_DOCS = st.lists(_WORDS.map(" ".join), min_size=1, max_size=12)


def _brute_mask(texts, k):
    """Brute-force duplicate-span masking (mirrors test_spans)."""
    toks = [re.findall(r"[a-z0-9]+", (t or "").lower()) for t in texts]
    counts: dict[str, int] = {}
    for tl in toks:
        for p in range(len(tl) - k + 1):
            g = " ".join(tl[p : p + k])
            counts[g] = counts.get(g, 0) + 1
    out = []
    for tl in toks:
        masked = np.zeros(len(tl), bool)
        for p in range(len(tl) - k + 1):
            if counts[" ".join(tl[p : p + k])] >= 2:
                masked[p : p + k] = True
        out.append(
            (
                len(tl),
                int(masked.sum()),
                " ".join(t for t, m in zip(tl, masked) if not m),
            )
        )
    return out


@settings(max_examples=200, deadline=None)
@given(_DOCS, st.integers(2, 4))
def test_gram_mask_kernel_matches_brute(texts, k):
    """The gram-enumerate + diff-array mask kernel equals the O(n·k)
    brute reference for arbitrary token streams (covers overlapping
    spans, within-doc repeats, docs shorter than k, empty docs)."""
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    tok_strings, off, nt, g_doc, g_pos, grams = spans._doc_grams_batch(batch, k)
    # corpus-wide duplicated grams of THIS batch (the whole corpus here)
    q = spans._gram_digests_dedup(grams)
    uniq, counts = np.unique(q, return_counts=True)
    dup = uniq[counts >= 2]
    if dup.size and q.size:
        i = np.searchsorted(dup, q)
        hit = (i < dup.size) & (dup[np.minimum(i, dup.size - 1)] == q)
    else:
        hit = np.zeros(q.size, bool)
    got = spans._mask_and_rebuild(
        np.arange(len(texts), dtype=np.int64),
        tok_strings,
        off,
        nt,
        g_doc[hit],
        g_pos[hit],
        k,
    )
    exp = _brute_mask(texts, k)
    assert got["n_tokens"].to_pylist() == [e[0] for e in exp]
    assert got["n_masked"].to_pylist() == [e[1] for e in exp]
    assert got["text_clean"].to_pylist() == [e[2] for e in exp]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 9)), min_size=0, max_size=60
    ),
    st.integers(1, 6),
)
def test_topn_in_order_matches_sort_reference(rows, n):
    """_topn_in_order == the obvious per-group sorted()[:n] reference
    for arbitrary (group, score) multisets."""
    src = np.asarray([r[0] for r in rows], np.int64)
    toks = np.asarray([r[1] for r in rows], np.int64)
    ids = np.arange(len(rows), dtype=np.int64)
    keep, rank = sampling._topn_in_order(src, toks, ids, n)
    got = sorted(zip(src[keep].tolist(), rank.tolist(), keep.tolist()))
    exp = []
    for g in sorted(set(src.tolist())):
        members = sorted(
            (int(i) for i in ids[src == g]), key=lambda i: (-toks[i], i)
        )
        exp.extend((g, r + 1, i) for r, i in enumerate(members[:n]))
    assert got == sorted(exp)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=8), min_size=0, max_size=50))
def test_md5_hex_array_arrow_equals_list_path(texts):
    """The Arrow-buffer hash path is byte-identical to the
    list-of-str path (incl. empty strings and unicode)."""
    from themis_search_engine_ray.pipelines.dedup import md5_hex_array

    arr = pa.array(texts, pa.string())
    assert md5_hex_array(arr).to_pylist() == md5_hex_array(texts).to_pylist()
    if len(texts) > 1:  # sliced arrays carry a nonzero offset
        assert (
            md5_hex_array(arr.slice(1)).to_pylist()
            == md5_hex_array(texts[1:]).to_pylist()
        )


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=8)), min_size=1, max_size=50))
def test_md5_hex_array_nulls_hash_as_empty(texts):
    from themis_search_engine_ray.pipelines.dedup import md5_hex_array

    arr = pa.array(texts, pa.string())
    assert md5_hex_array(arr).to_pylist() == md5_hex_array(texts).to_pylist()
