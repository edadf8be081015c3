"""Ray Data batch stages for the index build (stateless map_batches fns).

Replaces the reference's single-threaded per-doc build loop
(``themis/indexer/Indexer.java:280-465``) with two vectorizable batch
transforms over zero-copy Arrow batches of transcript turns:

* :class:`DocStatsBatcher` — per-turn doc stats (doc_id, dl, salt); no
  stemming needed (dl counts raw non-stopword tokens, Indexer.java:381).
* :class:`FragmentBatcher` — per-batch *partial posting fragments*, the
  combiner that shrinks the groupby-on-term shuffle: one row per
  (term, salt) per batch carrying binary-packed numpy arrays
  (doc_ids u64, tfs f64, per-doc position counts u32 + positions u32).

Doc identity / sharding scheme
------------------------------
``doc_id = blake2b64(conv_id \\x1f turn_idx) & (2^63-1)`` — stable,
shuffle-free, uniform. ``salt = doc_id >> (63 - salt_bits)`` — the top
bits, so each salt bucket is a contiguous doc_id *range*: per-term
posting runs from different salt buckets are disjoint, sorted ranges
that concatenate in salt order without re-sorting. This doubles as the
explicit skew handling demanded by the north_rule: every term — in
particular high-df hot terms — is split across all ``2^salt_bits``
buckets, bounding the largest shuffle group at ~df/S.

Group key for the shuffle: ``gkey = salt * term_parts + h(term) % term_parts``
so one shuffle group = (doc-range bucket × term-hash partition), sized
by construction to fit a worker's heap.

Collision note: 63-bit pair hashing is exact at test/bench scale and has
~3e-6 expected collisions at 10^9 turns; a deployment at the full
10^12-turn design point should switch ``doc_key`` to the dense
per-partition assignment documented in README §scale (file_idx<<40|row),
which needs no shuffle either.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np
import pyarrow as pa

from ..functions.analyzer import (
    AnalyzerConfig,
    DEFAULT_CONFIG,
    STOPWORDS,
    analyze_doc,
    analyze_tokens,
    tokenize,
)


def normalize_column(col) -> list[str]:
    """Vectorized M1 normalizer over an Arrow string column — row-wise
    identical to ``functions.analyzer.normalize`` (after ``[^a-zA-Z0-9]+``
    → space only ASCII alnum remains, so ``ascii_lower`` ≡ ``str.lower``;
    RE2 and Python's ``re`` agree on the negated ASCII class over
    codepoints, and ``str.split()`` collapses any space-run difference).
    Replaces a per-doc Python ``re.sub`` + ``.lower()`` (~8% of build
    CPU, profiled) with two C++ kernels per batch."""
    import pyarrow.compute as pc

    filled = pc.fill_null(col, "")
    return pc.ascii_lower(
        pc.replace_substring_regex(filled, pattern="[^a-zA-Z0-9]+", replacement=" ")
    ).to_pylist()


def doc_key(conv_id: str, turn_idx: int) -> int:
    h = hashlib.blake2b(f"{conv_id}\x1f{turn_idx}".encode(), digest_size=8).digest()
    return int.from_bytes(h, "little") & 0x7FFFFFFFFFFFFFFF


@lru_cache(maxsize=1 << 20)
def term_part(term: str, parts: int) -> int:
    h = hashlib.blake2b(term.encode(), digest_size=8).digest()
    return int.from_bytes(h, "little") % parts


def doc_keys_batch(conv_ids, turn_idxs) -> np.ndarray:
    out = np.empty(len(conv_ids), dtype=np.uint64)
    for i, (c, t) in enumerate(zip(conv_ids, turn_idxs)):
        out[i] = doc_key(c, t)
    return out


class DocStatsBatcher:
    """(conv_id, turn_idx, text) -> (doc_id, conv_id, turn_idx, dl, salt)."""

    def __init__(self, config: AnalyzerConfig = DEFAULT_CONFIG, salt_bits: int = 2):
        self.config = config
        self.salt_bits = salt_bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].to_pylist()
        turn = batch["turn_idx"].to_pylist()
        texts = batch["text"].to_pylist()
        use_stop = self.config.use_stopwords
        dls = np.empty(len(texts), dtype=np.int32)
        for i, t in enumerate(texts):
            toks = tokenize(t if t is not None else "")
            if use_stop:
                # dl counts every occurrence of non-stopword tokens
                dls[i] = sum(1 for x in toks if x not in STOPWORDS)
            else:
                dls[i] = len(toks)
        ids = doc_keys_batch(conv, turn)
        salts = (ids >> np.uint64(63 - self.salt_bits)).astype(np.int32)
        return pa.Table.from_arrays(
            [
                pa.array(ids.astype(np.int64)),
                batch["conv_id"],
                batch["turn_idx"],
                pa.array(dls),
                pa.array(salts),
            ],
            names=["doc_id", "conv_id", "turn_idx", "dl", "salt"],
        )


FRAGMENT_SCHEMA = pa.schema(
    [
        ("gkey", pa.int64()),
        ("salt", pa.int32()),
        ("term", pa.string()),
        ("docs", pa.large_binary()),  # u64 LE array
        ("tfs", pa.large_binary()),  # f64 LE array
        ("npos", pa.large_binary()),  # u32 LE per-doc position counts
        ("pos", pa.large_binary()),  # u32 LE concatenated positions
        ("extra", pa.large_binary()),  # doc-stat rows: packed texts (store_text)
    ]
)


def pack_conv_ids(convs: list[str]) -> bytes:
    """Length-prefixed utf-8 packing (conv ids may contain anything)."""
    return b"".join(
        len(b).to_bytes(4, "little") + b for b in (c.encode() for c in convs)
    )


def unpack_conv_ids(blob: bytes) -> list[str]:
    out, off, n = [], 0, len(blob)
    while off < n:
        ln = int.from_bytes(blob[off : off + 4], "little")
        off += 4
        out.append(blob[off : off + ln].decode())
        off += ln
    return out


class FragmentBatcher:
    """Turn batches into per-(term, salt) posting fragments (the combiner).

    With ``emit_doc_stats=True`` the same pass also emits one doc-stats
    fragment row per salt (sentinel ``gkey = -(salt+1)``, empty term;
    doc_ids/dl/turn/conv packed into the binary columns) so the whole
    build is ONE read + ONE shuffle — the groupby routes doc stats to
    their own writer groups alongside the posting groups.
    """

    def __init__(
        self,
        config: AnalyzerConfig = DEFAULT_CONFIG,
        salt_bits: int = 2,
        term_parts: int = 16,
        with_positions: bool = True,
        emit_doc_stats: bool = False,
        store_text: bool = False,
        with_role: bool = False,
    ):
        self.config = config
        self.salt_bits = salt_bits
        self.term_parts = term_parts
        self.with_positions = with_positions
        self.emit_doc_stats = emit_doc_stats
        # store_text packs the raw turn text into the doc-stat rows so
        # doc_stats becomes a doc store (the working equivalent of the
        # reference's unimplemented RESULT_TYPE.FULL —
        # themis/indexer/Indexer.java:1754-1783 returns null)
        self.store_text = store_text
        # with_role carries the transcript's role column into doc_stats
        # (fielded search: filter hits by role); doc-stat rows tunnel
        # the roles through the otherwise-empty term column
        self.with_role = with_role

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].to_pylist()
        turn = batch["turn_idx"].to_pylist()
        texts = batch["text"].to_pylist()
        norm_texts = normalize_column(batch["text"])
        if "doc_id" in batch.column_names:
            # precomputed ids (dense assignment — index_build's
            # doc_id_mode="dense"); top salt_bits must still be the salt
            ids = batch["doc_id"].to_numpy().astype(np.uint64)
        else:
            ids = doc_keys_batch(conv, turn)
        shift = np.uint64(63 - self.salt_bits)
        with_pos = self.with_positions
        cfg = self.config

        # Docs are processed in ascending doc_id order, so every stem's
        # accumulator arrives pre-sorted (one entry per doc per stem) —
        # no per-stem argsort, and salt ranges are contiguous by
        # construction. Positions accumulate FLAT (one array per stem),
        # not as per-doc lists — per-doc numpy conversions were ~10% of
        # build CPU. Output fragment content is identical: the writer
        # merges and (stably) re-sorts runs anyway.
        order = np.argsort(ids, kind="stable")
        acc: dict[str, tuple] = {}  # stem -> (docs, tfs, pos_flat, pos_cnt)
        dls = np.empty(len(texts), dtype=np.float64)
        for j in order:
            doc = analyze_tokens(norm_texts[j].split(), cfg)
            did = int(ids[j])
            dls[j] = doc.dl
            for stem, tf in doc.tfs.items():
                entry = acc.get(stem)
                if entry is None:
                    entry = acc[stem] = ([], [], [], [])
                entry[0].append(did)
                entry[1].append(tf)
                if with_pos:
                    pl = doc.positions[stem]
                    entry[2].extend(pl)
                    entry[3].append(len(pl))

        gkeys, salts, terms, docs_b, tfs_b, npos_b, pos_b = [], [], [], [], [], [], []
        extra_b: list[bytes] = []
        P = self.term_parts
        for stem, (dlist, tflist, pflat, pcnt) in acc.items():
            dids = np.asarray(dlist, dtype=np.uint64)  # ascending already
            tfs = np.asarray(tflist, dtype=np.float64)
            tsalts = (dids >> shift).astype(np.int64)
            kp = term_part(stem, P)
            # split this term's fragment at salt-range boundaries
            bounds = np.flatnonzero(np.diff(tsalts)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [dids.size]))
            if with_pos:
                cnts = np.asarray(pcnt, dtype=np.uint32)
                pos_arr = np.asarray(pflat, dtype=np.uint32)
                pends = np.cumsum(cnts, dtype=np.int64)
            for lo, hi in zip(starts, ends):
                s = int(tsalts[lo])
                gkeys.append(s * P + kp)
                salts.append(s)
                terms.append(stem)
                docs_b.append(dids[lo:hi].tobytes())
                tfs_b.append(tfs[lo:hi].tobytes())
                if with_pos:
                    npos_b.append(cnts[lo:hi].tobytes())
                    plo = 0 if lo == 0 else int(pends[lo - 1])
                    pos_b.append(pos_arr[plo : int(pends[hi - 1])].tobytes())
                else:
                    npos_b.append(b"")
                    pos_b.append(b"")

        extra_b.extend([b""] * (len(gkeys) - len(extra_b)))  # posting rows
        if self.emit_doc_stats:
            roles = batch["role"].to_pylist() if self.with_role else None
            batch_salts = (ids >> shift).astype(np.int64)
            turn_arr = np.asarray(turn, dtype=np.uint32)
            for s in np.unique(batch_salts):
                sel = np.flatnonzero(batch_salts == s)
                gkeys.append(-(int(s) + 1))  # sentinel: doc-stats group
                salts.append(int(s))
                terms.append(
                    "\x1f".join((roles[int(i)] or "") for i in sel)
                    if roles is not None
                    else ""
                )
                docs_b.append(ids[sel].tobytes())
                tfs_b.append(dls[sel].tobytes())
                npos_b.append(turn_arr[sel].tobytes())
                pos_b.append(pack_conv_ids([conv[int(i)] for i in sel]))
                extra_b.append(
                    pack_conv_ids(
                        [texts[int(i)] if texts[int(i)] is not None else "" for i in sel]
                    )
                    if self.store_text
                    else b""
                )

        return pa.Table.from_arrays(
            [
                pa.array(gkeys, pa.int64()),
                pa.array(salts, pa.int32()),
                pa.array(terms, pa.string()),
                pa.array(docs_b, pa.large_binary()),
                pa.array(tfs_b, pa.large_binary()),
                pa.array(npos_b, pa.large_binary()),
                pa.array(pos_b, pa.large_binary()),
                pa.array(extra_b, pa.large_binary()),
            ],
            schema=FRAGMENT_SCHEMA,
        )
