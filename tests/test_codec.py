"""Codec round-trip tests, including hypothesis property tests."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from themis_search_engine_ray.stages.codec import (
    BLOCK,
    all_tfs,
    decode_all_docs,
    decode_doc_block,
    decode_positions,
    decode_tf_block,
    encode_positions,
    encode_postings,
    skips_from_bytes,
    skips_to_bytes,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_edges():
    vals = np.array(
        [0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**32, 2**56, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_varint_empty():
    assert varint_encode(np.empty(0, np.uint64)) == b""
    assert varint_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_positions_roundtrip():
    lists = [np.array([0, 3, 7]), np.array([], dtype=np.int64), np.array([5])]
    out = decode_positions(encode_positions(lists), 3)
    for a, b in zip(lists, out):
        assert np.array_equal(np.asarray(a, np.int64), b)


def _random_postings(n, seed=0):
    rng = np.random.RandomState(seed)
    doc_ids = np.sort(rng.choice(np.arange(1, 10 * n + 1, dtype=np.uint64), n, replace=False))
    tfs = rng.rand(n)
    pos = [np.sort(rng.choice(200, rng.randint(0, 6), replace=False)).astype(np.int64) for _ in range(n)]
    return doc_ids, tfs, pos


def test_postings_roundtrip_multi_block():
    n = 5 * BLOCK + 17
    doc_ids, tfs, pos = _random_postings(n, seed=1)
    enc = encode_postings(doc_ids, tfs, pos)
    assert enc.df == n
    assert len(enc.skips) == 6
    assert np.array_equal(decode_all_docs(enc.doc_blob, enc.skips), doc_ids)
    assert np.array_equal(all_tfs(enc.tf_blob), tfs)
    # independent block decode
    for bi in range(len(enc.skips)):
        lo, hi = bi * BLOCK, min((bi + 1) * BLOCK, n)
        assert np.array_equal(decode_doc_block(enc.doc_blob, enc.skips, bi), doc_ids[lo:hi])
        assert np.array_equal(decode_tf_block(enc.tf_blob, enc.skips, bi), tfs[lo:hi])
    # block-max skip metadata
    assert enc.skips["last_doc"][-1] == doc_ids[-1]
    assert enc.skips["max_tf"][0] == tfs[:BLOCK].max()
    assert enc.max_tf == tfs.max()


def test_postings_positions_roundtrip():
    n = BLOCK + 3
    doc_ids, tfs, pos = _random_postings(n, seed=2)
    enc = encode_postings(doc_ids, tfs, pos)
    # decode positions per block
    got = []
    for bi in range(len(enc.skips)):
        start = int(enc.skips[bi]["pos_off"])
        end = int(enc.skips[bi + 1]["pos_off"]) if bi + 1 < len(enc.skips) else len(enc.pos_blob)
        got.extend(decode_positions(enc.pos_blob[start:end], int(enc.skips[bi]["n_docs"])))
    assert len(got) == n
    for a, b in zip(pos, got):
        assert np.array_equal(a, b)


def test_skips_serialization_roundtrip():
    n = 3 * BLOCK
    doc_ids, tfs, pos = _random_postings(n, seed=3)
    enc = encode_postings(doc_ids, tfs, pos)
    rt = skips_from_bytes(skips_to_bytes(enc.skips))
    assert np.array_equal(rt, enc.skips)


def test_single_posting():
    enc = encode_postings(np.array([42], np.uint64), np.array([0.5]), [np.array([7])])
    assert decode_all_docs(enc.doc_blob, enc.skips).tolist() == [42]
    assert all_tfs(enc.tf_blob).tolist() == [0.5]
