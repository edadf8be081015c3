"""Duplicate-span removal (pipelines/spans.py): semantics on synthetic
docs with known duplicated spans, a brute-force python reference, and
broadcast-path == distributed-join-path equality."""

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from themis_search_engine_ray.pipelines import spans


def _write_docs(tmp_path, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def _reference(texts, k):
    """Brute-force duplicate-span removal over a list of docs."""
    toks = [re.findall(r"[a-z0-9]+", (t or "").lower()) for t in texts]
    counts = {}
    for tl in toks:
        for p in range(len(tl) - k + 1):
            g = hashlib.md5(" ".join(tl[p : p + k]).encode()).digest()
            counts[g] = counts.get(g, 0) + 1
    rows = []
    for i, tl in enumerate(toks):
        masked = np.zeros(len(tl), bool)
        for p in range(len(tl) - k + 1):
            g = hashlib.md5(" ".join(tl[p : p + k]).encode()).digest()
            if counts[g] >= 2:
                masked[p : p + k] = True
        rows.append(
            {
                "doc_id": i,
                "n_tokens": len(tl),
                "n_masked": int(masked.sum()),
                "text_clean": " ".join(
                    t for t, m in zip(tl, masked) if not m
                ),
            }
        )
    return pd.DataFrame(rows)


TEXTS = [
    # 0/1 share a 6-token span (two overlapping 5-grams merge into one
    # masked cover region)
    "alpha beta gamma delta epsilon zeta ONE two three",
    "four five alpha beta gamma delta epsilon zeta six",
    # 2 repeats a 5-gram WITHIN itself (within-doc repeats count)
    "p q r s t xx p q r s t",
    # unique doc: nothing masked
    "u1 u2 u3 u4 u5 u6 u7 u8",
    # shorter than k: no grams, nothing masked
    "tiny doc",
    # empty / punctuation-only
    "",
    "?!,.",
    # exact duplicate pair: fully masked
    "dup dup2 dup3 dup4 dup5 dup6",
    "dup dup2 dup3 dup4 dup5 dup6",
]


def _run(sf_dir, **kw):
    return (
        spans.span_dedup(sf_dir, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_span_dedup_semantics(ray_session, tmp_path):
    sf = _write_docs(tmp_path, TEXTS)
    got = _run(sf, k=5)
    want = _reference(TEXTS, 5).astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)
    # spot-checks of the interesting rows
    by_id = got.set_index("doc_id")
    assert by_id.loc[0, "n_masked"] == 6  # merged cover of 2 grams
    assert by_id.loc[0, "text_clean"] == "one two three"
    assert by_id.loc[2, "n_masked"] == 10  # both within-doc occurrences
    assert by_id.loc[2, "text_clean"] == "xx"
    assert by_id.loc[3, "n_masked"] == 0
    assert by_id.loc[4, "n_masked"] == 0 and by_id.loc[4, "n_tokens"] == 2
    assert by_id.loc[5, "n_tokens"] == 0 and by_id.loc[5, "text_clean"] == ""
    assert by_id.loc[7, "n_masked"] == 6 and by_id.loc[7, "text_clean"] == ""
    assert by_id.loc[8, "text_clean"] == ""


def test_span_dedup_join_path_equals_broadcast(ray_session, tmp_path):
    sf = _write_docs(tmp_path, TEXTS)
    a = _run(sf, k=5, mode="broadcast")
    b = _run(sf, k=5, mode="join")
    pd.testing.assert_frame_equal(a, b)
    # auto mode falls over to the join path when the dup set exceeds
    # the cap — same output
    c = _run(sf, k=5, mode="auto", broadcast_cap=1)
    pd.testing.assert_frame_equal(a, c)


def test_span_dedup_k_boundary(ray_session, tmp_path):
    # k == doc length: the whole doc is one gram; duplicated docs mask
    # entirely, unique docs keep everything
    texts = ["a b c", "a b c", "x y z"]
    sf = _write_docs(tmp_path, texts)
    got = _run(sf, k=3).set_index("doc_id")
    assert got.loc[0, "text_clean"] == "" and got.loc[1, "text_clean"] == ""
    assert got.loc[2, "text_clean"] == "x y z"
    want = _reference(texts, 3)
    pd.testing.assert_frame_equal(
        got.reset_index(), want.astype(got.reset_index().dtypes.to_dict())
    )


def test_span_dedup_sf_testdata(ray_session):
    """Over the real sf0.001 fixture: totals match the brute reference."""
    sf = "/root/testdata/sf0.001"
    got = _run(sf)
    texts = (
        pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        .sort_by("doc_id")
        .column("text")
        .to_pylist()
    )
    want = _reference(texts, spans.SPAN_K)
    # doc_ids in the fixture are not necessarily 0..n-1; compare the
    # order-aligned payload columns
    got = got.sort_values("doc_id").reset_index(drop=True)
    for col in ("n_tokens", "n_masked", "text_clean"):
        assert list(got[col]) == list(want[col]), col
    assert (got["n_masked"] > 0).any()  # the fixture plants duplicates
