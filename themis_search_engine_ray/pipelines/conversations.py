"""Conversation-level operators over the transcript corpus.

The engine's document unit is one TURN (stable docID ``(conv_id,
turn_idx)``, mirroring ``themis`` S2/S3 where a document is one corpus
entry); training pipelines additionally need the CONVERSATION view —
all turns of a conv_id stitched back together in turn order (chat-ML
style rendering, per-conversation token budgeting, conversation-level
filtering).

Scale design (100 TB): conversations are individually tiny (bounded
turn count) but astronomically numerous, so per-conversation
``map_groups`` calls (one Python call per conversation) are the wrong
altitude. Instead conversations are bucketed by a hash of ``conv_id``
(~``_ROWS_PER_BUCKET`` turns per bucket) and ONE vectorized pass
assembles every conversation in a bucket: dictionary-encode conv_id,
``np.lexsort`` by (code, turn_idx), then one ``ListArray`` +
``binary_join`` rebuilds all transcripts at once. One shuffle total,
no per-group Python, bucket count scales with input rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# target turns per assembly bucket; the reduce holds one bucket at a
# time, so this bounds reducer memory independent of corpus size
_ROWS_PER_BUCKET = 1_000_000


def _conv_bucket(conv_ids: list, n_buckets: int) -> np.ndarray:
    """Deterministic bucket of each conv_id string: first 8 bytes of
    md5(conv_id) as big-endian uint64, mod n_buckets (PYTHONHASHSEED-
    independent; the per-row md5 is irreducible, the rest is one
    frombuffer pass)."""
    if not conv_ids:
        return np.empty(0, np.int64)
    md5 = hashlib.md5
    buf = b"".join(md5(c.encode()).digest()[:8] for c in conv_ids)
    h = np.frombuffer(buf, dtype=">u8")
    return (h % np.uint64(n_buckets)).astype(np.int64)


def _assemble_bucket(group: pa.Table) -> pa.Table:
    """Vectorized assembly of EVERY conversation in one bucket:
    (conv_id, n_turns, n_chars, convo) with convo =
    'role: text' lines joined by newline in turn_idx order."""
    conv = group["conv_id"]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    codes = conv.dictionary_encode()
    idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_convs = len(codes.dictionary)
    turn = group["turn_idx"].to_numpy().astype(np.int64)
    order = np.lexsort((turn, idx))

    text = pc.fill_null(group["text"], "")
    pieces = pc.binary_join_element_wise(group["role"], text, ": ")
    if isinstance(pieces, pa.ChunkedArray):
        pieces = pieces.combine_chunks()
    pieces = pieces.take(pa.array(order))
    if isinstance(pieces, pa.ChunkedArray):
        pieces = pieces.combine_chunks()

    counts = np.bincount(idx, minlength=n_convs).astype(np.int64)
    offs = np.zeros(n_convs + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    assert offs[-1] == len(group)
    convo = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offs, pa.int32()), pieces), "\n"
    )

    chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    n_chars = np.zeros(n_convs, np.int64)
    np.add.at(n_chars, idx, chars)

    return pa.Table.from_arrays(
        [
            codes.dictionary,
            pa.array(counts),
            pa.array(n_chars),
            convo,
        ],
        names=["conv_id", "n_turns", "n_chars", "convo"],
    )


def conversation_dedup(sf_dir: str, n_buckets: int | None = None):
    """Exact dedup at CONVERSATION granularity: one ``(conv_id,
    conv_hash)`` row per distinct assembled transcript, keeping the
    minimal conv_id (the turn-level twin is ``dedup.exact_dedup``).
    Rides :func:`conversation_assemble`'s bucketed stitch plus one
    Min aggregate over ``md5(convo)`` — the rendered transcript hashes
    role AND order, so two conversations match only if every turn
    matches in sequence."""
    from ray.data.aggregate import Min

    from .dedup import md5_hex_array

    def hash_rows(batch: pa.Table) -> pa.Table:
        conv = batch["convo"]
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        return pa.Table.from_arrays(
            [batch["conv_id"], md5_hex_array(conv)],
            names=["conv_id", "conv_hash"],
        )

    return (
        conversation_assemble(sf_dir, n_buckets)
        .map_batches(hash_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("conv_hash")
        .aggregate(Min("conv_id", alias_name="conv_id"))
        .select_columns(["conv_id", "conv_hash"])
    )


def conversation_assemble(sf_dir: str, n_buckets: int | None = None):
    """(conv_id, n_turns, n_chars, convo): every conversation of the
    derived transcript corpus stitched back together in turn order.

    ``convo`` is the chat-ML-ish rendering ``role: text`` per turn,
    newline-joined; ``n_chars`` sums the raw turn-text lengths (NULL
    text counts 0 chars and renders as an empty line body)."""
    import pyarrow.parquet as pq

    from ..sources.transcripts import from_documents

    if n_buckets is None:
        n_rows = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
        n_buckets = max(16, n_rows // _ROWS_PER_BUCKET)

    def tag(batch: pa.Table) -> pa.Table:
        # NULL conv_id groups under "" (the same fill/coalesce key rule
        # as mixing); the derived corpus never produces one
        conv = pc.fill_null(batch["conv_id"], "")
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        batch = batch.set_column(
            batch.schema.get_field_index("conv_id"), "conv_id", conv
        )
        return batch.append_column(
            "bucket", pa.array(_conv_bucket(conv.to_pylist(), n_buckets), pa.int64())
        )

    return (
        from_documents(sf_dir)
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(_assemble_bucket, batch_format="pyarrow")
    )
