"""Posting-list codec: delta + varint (LEB128) into blocked skip-list blobs.

The reference stores fixed 56-byte postings (40-byte ASCII docID + 8-byte
tf + 8-byte pointer — ``themis/indexer/indexes/Index.java:209-228``).
We replace that with compressed, blocked segments per the north_star:

per term (within one doc_id-range shard):
  * docs  — doc_ids ascending, gap-encoded as varints in blocks of
    ``BLOCK`` postings; the first gap of each block is relative to the
    previous block's last doc_id (0 for the first block), so any block
    decodes independently given its skip entry.
  * tfs   — raw little-endian float64 (the stored max-normalized tf is a
    double; it does not varint-compress), sliceable per block.
  * pos   — per doc: varint n_positions, then delta-varint positions.
  * skips — per block: (last_doc_id: u64, doc_byte_off: u32,
    pos_byte_off: u32, n_docs: u16, max_tf: f64). ``max_tf`` per block is
    the block-max used for safe WAND-style upper bounds; ``last_doc_id``
    is the skip key for binary-searching blocks by doc range.

Everything is numpy-vectorized: varint encode walks ≤10 byte-lanes over
the whole array; decode reconstructs all values with ≤10 masked
gather/or passes — no per-posting Python loops.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128  # postings per block

_SKIP_DTYPE = np.dtype(
    [
        ("last_doc", "<u8"),
        ("doc_off", "<u4"),
        ("pos_off", "<u4"),
        ("n_docs", "<u2"),
        ("max_tf", "<f8"),
    ]
)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # exact byte length per value via threshold comparisons (1..10)
    nb = np.ones(v.shape, dtype=np.int64)
    for i in range(1, 10):
        nb += (v >= np.uint64(1) << np.uint64(7 * i)).astype(np.int64)
    ends = np.cumsum(nb)
    total = int(ends[-1])
    starts = ends - nb
    out = np.zeros(total, dtype=np.uint8)
    for i in range(10):
        mask = nb > i
        if not mask.any():
            break
        vals = (v[mask] >> np.uint64(7 * i)) & np.uint64(0x7F)
        cont = (nb[mask] > i + 1).astype(np.uint8) << 7
        out[starts[mask] + i] = vals.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 byte buffer to uint64 (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = b < 128
    ends = np.flatnonzero(is_end)
    if count is not None:
        ends = ends[:count]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    vals = np.zeros(ends.shape, dtype=np.uint64)
    maxlen = int(lens.max())
    for i in range(maxlen):
        mask = lens > i
        vals[mask] |= (b[starts[mask] + i] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * i)
    return vals


def encode_positions(pos_lists: list[np.ndarray]) -> bytes:
    """Per doc: varint n, then delta-varint positions (first absolute)."""
    if not pos_lists:
        return b""
    # Flatten into one varint stream: [n0, d0_0, d0_1..., n1, ...]
    chunks = []
    for p in pos_lists:
        p = np.asarray(p, dtype=np.uint64)
        deltas = np.empty(p.size + 1, dtype=np.uint64)
        deltas[0] = p.size
        if p.size:
            deltas[1] = p[0]
            deltas[2:] = np.diff(p)
        chunks.append(deltas)
    return varint_encode(np.concatenate(chunks))


def decode_positions(buf, n_docs: int) -> list[np.ndarray]:
    vals = varint_decode(buf)
    out = []
    i = 0
    for _ in range(n_docs):
        n = int(vals[i])
        i += 1
        deltas = vals[i : i + n]
        i += n
        out.append(np.cumsum(deltas).astype(np.int64) if n else np.empty(0, np.int64))
    return out


class EncodedPostings:
    """Encoded posting list for one term (one shard)."""

    __slots__ = ("df", "max_tf", "doc_blob", "tf_blob", "pos_blob", "skips")

    def __init__(self, df, max_tf, doc_blob, tf_blob, pos_blob, skips):
        self.df = df
        self.max_tf = max_tf
        self.doc_blob = doc_blob
        self.tf_blob = tf_blob
        self.pos_blob = pos_blob
        self.skips = skips


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, pos_lists: list[np.ndarray] | None = None
) -> EncodedPostings:
    """Encode one term's postings (doc_ids must be ascending, unique)."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.float64)
    n = doc_ids.size
    n_blocks = (n + BLOCK - 1) // BLOCK
    skips = np.zeros(n_blocks, dtype=_SKIP_DTYPE)
    doc_chunks = []
    pos_chunks = []
    doc_off = 0
    pos_off = 0
    prev_last = np.uint64(0)
    for bi in range(n_blocks):
        lo, hi = bi * BLOCK, min((bi + 1) * BLOCK, n)
        ids = doc_ids[lo:hi]
        gaps = np.empty(ids.size, dtype=np.uint64)
        gaps[0] = ids[0] - prev_last
        gaps[1:] = np.diff(ids)
        blob = varint_encode(gaps)
        doc_chunks.append(blob)
        if pos_lists is not None:
            pblob = encode_positions(pos_lists[lo:hi])
        else:
            pblob = b""
        pos_chunks.append(pblob)
        skips[bi] = (
            ids[-1],
            doc_off,
            pos_off,
            hi - lo,
            float(tfs[lo:hi].max()),
        )
        doc_off += len(blob)
        pos_off += len(pblob)
        prev_last = ids[-1]
    return EncodedPostings(
        df=n,
        max_tf=float(tfs.max()) if n else 0.0,
        doc_blob=b"".join(doc_chunks),
        tf_blob=tfs.tobytes(),
        pos_blob=b"".join(pos_chunks),
        skips=skips,
    )


def decode_doc_block(doc_blob, skips: np.ndarray, bi: int) -> np.ndarray:
    """Decode one block's doc_ids independently via its skip entry."""
    s = skips[bi]
    start = int(s["doc_off"])
    end = int(skips[bi + 1]["doc_off"]) if bi + 1 < len(skips) else len(doc_blob)
    base = np.uint64(skips[bi - 1]["last_doc"]) if bi > 0 else np.uint64(0)
    gaps = varint_decode(doc_blob[start:end], count=int(s["n_docs"]))
    return base + np.cumsum(gaps, dtype=np.uint64)


def decode_all_docs(doc_blob, skips: np.ndarray) -> np.ndarray:
    """Decode the full doc_id array (all blocks) in one vectorized pass."""
    n = int(skips["n_docs"].sum())
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    gaps = varint_decode(doc_blob, count=n)
    ids = np.cumsum(gaps, dtype=np.uint64)
    # each block's gaps restart from the previous block's last_doc, so the
    # plain cumsum is already correct: gap[block_start] was encoded
    # relative to prev_last which the cumsum has just produced.
    return ids


def decode_tf_block(tf_blob, skips: np.ndarray, bi: int) -> np.ndarray:
    lo = int(skips[:bi]["n_docs"].sum())
    n = int(skips[bi]["n_docs"])
    return np.frombuffer(tf_blob, dtype="<f8", count=n, offset=lo * 8)


def all_tfs(tf_blob) -> np.ndarray:
    return np.frombuffer(tf_blob, dtype="<f8")


def skips_to_bytes(skips: np.ndarray) -> bytes:
    return np.ascontiguousarray(skips, dtype=_SKIP_DTYPE).tobytes()


def skips_from_bytes(buf) -> np.ndarray:
    return np.frombuffer(buf, dtype=_SKIP_DTYPE)
