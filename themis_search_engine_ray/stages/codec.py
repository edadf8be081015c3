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
    return varint_encode_with_lengths(values)[0]


def varint_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode; also return the byte length of each value (lets
    callers compute block byte offsets without re-encoding per block)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, np.int64)
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
    return out.tobytes(), nb


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


def ranges_to_indices(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized concatenation of [s, s+len) ranges into one index array
    (the gather backbone — replaces per-row Python loops)."""
    starts = np.asarray(starts, np.int64)
    lens = np.asarray(lens, np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    idx = np.repeat(starts, lens)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    return idx + within


def gather_ranges(data: np.ndarray, starts, lens) -> np.ndarray:
    """Concatenate ``data[s : s+len]`` slices into one array.

    Equivalent to ``data[ranges_to_indices(starts, lens)]`` but via
    sequential slice memcpys into one preallocated output — no
    total-size index temporaries (np.repeat + np.arange) and no
    random-gather pass. With ~10-100 postings per range the Python
    loop is ~1 µs/row while the avoided allocations are the dominant
    cost on fault-bound hosts (NOTES.md); wins whenever ranges are
    multi-element."""
    starts = np.asarray(starts, np.int64)
    lens = np.asarray(lens, np.int64)
    total = int(lens.sum())
    out = np.empty(total, data.dtype)
    pos = 0
    for s, n in zip(starts.tolist(), lens.tolist()):
        if n:
            out[pos : pos + n] = data[s : s + n]
            pos += n
    return out


def position_stream_values(counts: np.ndarray, flat: np.ndarray) -> np.ndarray:
    """Interleaved per-doc position stream [n, p0, d1, ...] as one u64
    array — fully vectorized over (per-doc counts, flat positions)."""
    counts = np.asarray(counts, np.int64)
    n_docs = counts.size
    if n_docs == 0:
        return np.empty(0, np.uint64)
    flat = np.asarray(flat, np.uint64)
    total = int(counts.sum())
    values = np.empty(total + n_docs, np.uint64)
    out_heads = np.concatenate(([0], np.cumsum(counts + 1)[:-1]))
    values[out_heads] = counts.astype(np.uint64)
    mask = np.ones(total + n_docs, bool)
    mask[out_heads] = False
    if total:
        deltas = flat.copy()
        deltas[1:] = flat[1:] - flat[:-1]
        doc_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        hs = doc_starts[counts > 0]
        deltas[hs] = flat[hs]  # first position of each doc stays absolute
        values[mask] = deltas
    return values


def encode_positions_flat(counts: np.ndarray, flat: np.ndarray) -> bytes:
    """Per doc: varint n, then delta-varint positions (first absolute)."""
    if np.asarray(counts).size == 0:
        return b""
    return varint_encode(position_stream_values(counts, flat))


def encode_positions(pos_lists: list[np.ndarray]) -> bytes:
    """List-of-arrays convenience wrapper over encode_positions_flat."""
    if not pos_lists:
        return b""
    counts = np.asarray([len(p) for p in pos_lists], np.int64)
    flat = (
        np.concatenate([np.asarray(p, np.uint64) for p in pos_lists])
        if counts.sum()
        else np.empty(0, np.uint64)
    )
    return encode_positions_flat(counts, flat)


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
    if pos_lists is None:
        return encode_postings_flat(doc_ids, tfs, None, None)
    counts = np.asarray([len(p) for p in pos_lists], np.int64)
    flat = (
        np.concatenate([np.asarray(p, np.uint64) for p in pos_lists])
        if counts.sum()
        else np.empty(0, np.uint64)
    )
    return encode_postings_flat(doc_ids, tfs, counts, flat)


def encode_postings_flat(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    pos_counts: np.ndarray | None,
    pos_flat: np.ndarray | None,
) -> EncodedPostings:
    """Encode one term's postings with positions given as (per-doc
    counts, flat concatenated positions) — no per-doc/per-block Python.

    Each block's first gap is relative to the previous block's last
    doc_id, which for consecutive blocks equals the plain delta — so the
    whole gap stream is ONE delta array varint-encoded in one call, and
    per-block byte offsets come from the per-value encoded lengths. The
    produced blobs are byte-identical to per-block encoding."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.float64)
    n = doc_ids.size
    n_blocks = (n + BLOCK - 1) // BLOCK
    skips = np.zeros(n_blocks, dtype=_SKIP_DTYPE)
    if n == 0:
        return EncodedPostings(0, 0.0, b"", b"", b"", skips)

    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = doc_ids[0]
    gaps[1:] = np.diff(doc_ids)
    doc_blob, doc_nb = varint_encode_with_lengths(gaps)
    doc_byte_off = np.concatenate(([0], np.cumsum(doc_nb)))

    heads = np.arange(n_blocks, dtype=np.int64) * BLOCK
    ends = np.minimum(heads + BLOCK, n)

    if pos_counts is not None:
        pos_counts = np.asarray(pos_counts, np.int64)
        values = position_stream_values(pos_counts, pos_flat)
        pos_blob, pos_nb = varint_encode_with_lengths(values)
        val_byte_off = np.concatenate(([0], np.cumsum(pos_nb)))
        doc_val_off = np.concatenate(([0], np.cumsum(pos_counts + 1)))
        pos_off_per_block = val_byte_off[doc_val_off[heads]]
    else:
        pos_blob = b""
        pos_off_per_block = np.zeros(n_blocks, np.int64)

    skips["last_doc"] = doc_ids[ends - 1]
    skips["doc_off"] = doc_byte_off[heads]
    skips["pos_off"] = pos_off_per_block
    skips["n_docs"] = ends - heads
    skips["max_tf"] = np.maximum.reduceat(tfs, heads)
    return EncodedPostings(
        df=n,
        max_tf=float(tfs.max()),
        doc_blob=doc_blob,
        tf_blob=tfs.tobytes(),
        pos_blob=pos_blob,
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
