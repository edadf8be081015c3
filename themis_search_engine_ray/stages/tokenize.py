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
``doc_id = mix64(blake2b64(conv_id) ^ mix64(turn_idx + GOLDEN)) &
(2^63-1)`` — stable, shuffle-free, uniform, and vectorizable: the
string hash runs once per *unique* conv (dictionary-encode + a
module-level memo; a conversation contributes many turns), the
splitmix64 finalizer combines with ``turn_idx`` as whole-batch numpy
ops. ``salt = doc_id >> (63 - salt_bits)`` — the top
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
    _STEM_CACHE,
    _STEM_CACHE_MAX,
    AnalyzerConfig,
    DEFAULT_CONFIG,
    STOPWORDS,
)
from ..functions.porter import stem_token


def normalize_column(col, as_arrow: bool = False):
    """Vectorized M1 normalizer over an Arrow string column — row-wise
    identical to ``functions.analyzer.normalize`` (after ``[^a-zA-Z0-9]+``
    → space only ASCII alnum remains, so ``ascii_lower`` ≡ ``str.lower``;
    RE2 and Python's ``re`` agree on the negated ASCII class over
    codepoints, and ``str.split()`` collapses any space-run difference).
    Replaces a per-doc Python ``re.sub`` + ``.lower()`` (~8% of build
    CPU, profiled) with two C++ kernels per batch."""
    import pyarrow.compute as pc

    filled = pc.fill_null(col, "")
    out = pc.ascii_lower(
        pc.replace_substring_regex(filled, pattern="[^a-zA-Z0-9]+", replacement=" ")
    )
    return out if as_arrow else out.to_pylist()


def _cumsum_excl(counts: np.ndarray) -> np.ndarray:
    out = np.empty(counts.size, np.int64)
    if counts.size:
        out[0] = 0
        np.cumsum(counts[:-1], out=out[1:])
    return out


def token_codes_batch(text_col, lower_first: bool = False):
    """Vectorized M1-M2 over a whole Arrow text column: normalize →
    whitespace-split → flatten → dictionary-encode. Returns
    ``(uniq, codes, lens, n)`` where ``uniq`` is the batch's unique-token
    list, ``codes[i]`` indexes ``uniq`` for flat token i (doc boundaries
    from ``lens``), and empty-string split artifacts (Arrow emits them
    for leading/trailing runs; Python's ``str.split()`` never does) are
    NOT yet dropped — their code is flagged so callers can mask them.
    Shared by the index build, df/count pipelines and dedup shingling.

    ``lower_first=False`` (default) is M1 semantics: strip non-ASCII
    alnum THEN ascii-lower (a Unicode char whose lowercase is ASCII,
    e.g. U+212A KELVIN SIGN, is dropped). ``lower_first=True`` is the
    dedup/oracle tokenization ``[a-z0-9]+`` runs of ``text.lower()``:
    Unicode-lower FIRST, so that same char becomes a literal ``k``
    (matches ``re.findall('[a-z0-9]+', text.lower())`` and DuckDB's
    ``string_split_regex(lower(text), ...)`` modulo utf8proc-vs-Python
    lowercase table differences, which agree on all common text)."""
    import pyarrow.compute as pc

    if lower_first:
        norm = pc.replace_substring_regex(
            pc.utf8_lower(pc.fill_null(text_col, "")),
            pattern="[^a-z0-9]+",
            replacement=" ",
        )
    else:
        norm = normalize_column(text_col, as_arrow=True)
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    n = len(norm)
    toks = pc.ascii_split_whitespace(norm)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq: list[str] = enc.dictionary.to_pylist()
    return uniq, codes, lens, n


def kept_token_codes(text_col, lower_first: bool = False):
    """:func:`token_codes_batch` with the ``''`` boundary artifacts
    already masked out: returns ``(uniq, codes, doc_of, n)`` where
    ``codes``/``doc_of`` are the per-token code and document index of
    every REAL token, in stream order (within-doc adjacency preserved —
    artifacts only ever sit at document boundaries). ``uniq`` may still
    contain the ``''`` entry; no kept code references it. The shared
    preamble of the counting/shingling pipelines."""
    uniq, codes, lens, n = token_codes_batch(text_col, lower_first=lower_first)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    if len(uniq):
        real = np.fromiter((bool(t) for t in uniq), bool, len(uniq))
        keep = real[codes]
        doc_of, codes = doc_of[keep], codes[keep]
    return uniq, codes, doc_of, n


def batch_token_counts(text_col) -> tuple[list[str], np.ndarray]:
    """Whole-batch token counts, row-wise identical to summing
    ``Counter(tokenize(text))`` over the batch: returns (tokens, counts)
    for every distinct normalized token. Python touches nothing per row
    — one bincount over the dictionary codes."""
    uniq, codes, _, _ = token_codes_batch(text_col)
    counts = np.bincount(codes, minlength=len(uniq))
    toks: list[str] = []
    keep: list[int] = []
    for u, tok in enumerate(uniq):
        if tok:
            toks.append(tok)
            keep.append(u)
    return toks, counts[np.asarray(keep, np.int64)] if keep else np.empty(0, np.int64)


def analyze_batch(
    text_col,
    config: AnalyzerConfig = DEFAULT_CONFIG,
    with_positions: bool = True,
    with_tf: bool = True,
):
    """Vectorized M1-M8 analysis of a whole Arrow text column.

    Row-for-row identical to ``analyze_tokens(tokenize(text))`` (the
    per-doc reference-conformant path, Indexer.java:286-418) but with the
    per-token work done by Arrow/numpy kernels; Python touches only the
    *unique* tokens of the batch (stem/stopword mapping, memoized
    module-globally across batches). The tf quirk — ``count`` divided by
    ``max_fieldfreq`` once per distinct raw term feeding the stem — runs
    as masked vector divisions, one pass per division round, which is the
    identical IEEE op sequence per element as the scalar loop.

    Returns ``(dls, pair_doc, pair_stem, stems, pair_count, pair_tf,
    pos_sorted, pair_pos_start)`` where pairs are (doc, stem) rows sorted
    by ``(doc, stem)``; ``pos_sorted[pair_pos_start[i] : pair_pos_start[i]
    + pair_count[i]]`` are pair i's ascending token positions (positions
    index the normalized token stream *including* stopword slots).

    ``with_positions=False`` skips position bookkeeping (pos_sorted /
    pair_pos_start are None); ``with_tf=False`` additionally skips the
    max-normalized-tf division rounds (pair_tf is None) — the fast path
    for df/count pipelines that only need (doc, stem) pairs.
    """
    stem_cache = _STEM_CACHE
    use_stop = config.use_stopwords
    use_stem = config.use_stemmer

    uniq, codes, lens, n = token_codes_batch(text_col)
    U = max(1, len(uniq))

    # map each unique token -> local stem id (-1 = dropped). Arrow's
    # ascii_split_whitespace emits "" for leading/trailing runs that
    # Python's str.split() never yields — always dropped, and dropped
    # BEFORE position numbering (stage A below) so positions match the
    # reference token stream.
    stems: list[str] = []
    stem_local: dict[str, int] = {}
    stem_of = np.empty(len(uniq), np.int64)
    empty_code = -1
    for u, tok in enumerate(uniq):
        if not tok:
            stem_of[u] = -2  # not-a-token (split artifact)
            empty_code = u
            continue
        if use_stop and tok in STOPWORDS:
            stem_of[u] = -1  # stopword: occupies a position slot only
            continue
        if use_stem:
            s = stem_cache.get(tok)
            if s is None:
                s = stem_token(tok)
                if len(stem_cache) < _STEM_CACHE_MAX:
                    stem_cache[tok] = s
        else:
            s = tok
        sid = stem_local.get(s)
        if sid is None:
            sid = stem_local[s] = len(stems)
            stems.append(s)
        stem_of[u] = sid
    S = max(1, len(stems))

    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)

    # stage A: drop split artifacts, then number positions within doc
    if empty_code >= 0:
        real = codes != empty_code
        codes = codes[real]
        doc_idx = doc_idx[real]
        lens = np.bincount(doc_idx, minlength=n)
    if with_positions:
        pos_all = np.arange(codes.size, dtype=np.int64) - np.repeat(
            _cumsum_excl(lens), lens
        )

    # stage B: drop stopwords (position slots already assigned)
    sid_all = stem_of[codes]
    keep = sid_all >= 0
    kd = doc_idx[keep]
    ks = sid_all[keep]

    dls = np.bincount(kd, minlength=n).astype(np.float64)

    # group kept tokens by (doc, stem); stable sort keeps positions ascending
    key = kd * S + ks
    if with_positions:
        kpos = pos_all[keep]
        order = np.argsort(key, kind="stable")
        skey = key[order]
        pos_sorted = kpos[order]
        ukey, first, pair_count = np.unique(skey, return_index=True, return_counts=True)
        pair_pos_start = first.astype(np.int64)
    else:
        pos_sorted = None
        pair_pos_start = None
        ukey, pair_count = np.unique(key, return_counts=True)
    pair_doc = ukey // S
    pair_stem = (ukey % S).astype(np.int64)

    if with_tf:
        kc = codes[keep]
        # rawn: distinct raw tokens feeding each (doc, stem) pair — via the
        # distinct (doc, raw-token) keys (max n*U, no 3-way key overflow)
        urk = np.unique(kd * U + kc)
        upair = np.searchsorted(ukey, (urk // U) * S + stem_of[urk % U])
        rawn = np.bincount(upair, minlength=ukey.size)

        # max_fieldfreq per doc (floor 1.0, Indexer.java:287)
        maxtf_doc = np.ones(n, np.float64)
        np.maximum.at(maxtf_doc, pair_doc, pair_count.astype(np.float64))

        # sequential divisions, one vector pass per round (Indexer.java:410-418)
        tf = pair_count.astype(np.float64)
        mt = maxtf_doc[pair_doc]
        r = rawn.copy()
        while True:
            m = r > 0
            if not m.any():
                break
            tf[m] /= mt[m]
            r[m] -= 1
    else:
        tf = None

    return dls, pair_doc, pair_stem, stems, pair_count.astype(np.int64), tf, pos_sorted, pair_pos_start


# Doc-id hash v2 (fingerprint "dk=2"): blake2b of the conv string —
# computed once per UNIQUE conv and memoized — combined with turn_idx
# through a splitmix64 finalizer that runs as whole-batch numpy ops.
# v1 hashed the f"{conv}\x1f{turn}" string per ROW (one Python blake2b
# call per turn — the last per-row Python in the build hot path).
_MASK64 = 0xFFFFFFFFFFFFFFFF
_GOLDEN = 0x9E3779B97F4A7C15
_MIX_A = 0xBF58476D1CE4E5B9
_MIX_B = 0x94D049BB133111EB


def _mix64_scalar(x: int) -> int:
    x &= _MASK64
    x ^= x >> 30
    x = (x * _MIX_A) & _MASK64
    x ^= x >> 27
    x = (x * _MIX_B) & _MASK64
    return x ^ (x >> 31)


def _mix64_vec(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(_MIX_A)  # uint64 wraps mod 2^64
    x ^= x >> np.uint64(27)
    x *= np.uint64(_MIX_B)
    x ^= x >> np.uint64(31)
    return x


_CONV_HASH_CACHE: dict[str, int] = {}
_CONV_HASH_CACHE_MAX = 1 << 20


def _conv_hash64(conv_id: str) -> int:
    h = _CONV_HASH_CACHE.get(conv_id)
    if h is None:
        h = int.from_bytes(
            hashlib.blake2b(conv_id.encode(), digest_size=8).digest(), "little"
        )
        if len(_CONV_HASH_CACHE) < _CONV_HASH_CACHE_MAX:
            _CONV_HASH_CACHE[conv_id] = h
    return h


def doc_key(conv_id: str, turn_idx: int) -> int:
    return (
        _mix64_scalar(_conv_hash64(conv_id) ^ _mix64_scalar(int(turn_idx) + _GOLDEN))
        & 0x7FFFFFFFFFFFFFFF
    )


@lru_cache(maxsize=1 << 20)
def term_part(term: str, parts: int) -> int:
    h = hashlib.blake2b(term.encode(), digest_size=8).digest()
    return int.from_bytes(h, "little") % parts


def doc_keys_batch(conv_ids, turn_idxs) -> np.ndarray:
    """Vectorized ``doc_key`` over a batch. ``conv_ids`` may be an Arrow
    string array/column or a Python list; ``turn_idxs`` any int sequence.
    Python work is one memoized blake2b per unique conv; the combine is
    numpy."""
    import pyarrow.compute as pc

    if not isinstance(conv_ids, (pa.Array, pa.ChunkedArray)):
        conv_ids = pa.array(conv_ids, pa.string())
    enc = pc.dictionary_encode(conv_ids)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq_h = np.fromiter(
        (_conv_hash64(c) for c in enc.dictionary.to_pylist()),
        np.uint64,
        len(enc.dictionary),
    )
    if isinstance(turn_idxs, (pa.Array, pa.ChunkedArray)):
        turns = turn_idxs.to_numpy(zero_copy_only=False)
    else:
        turns = np.asarray(turn_idxs)
    t = turns.astype(np.uint64) + np.uint64(_GOLDEN)
    out = _mix64_vec(uniq_h[codes] ^ _mix64_vec(t))
    return out & np.uint64(0x7FFFFFFFFFFFFFFF)


class DocStatsBatcher:
    """(conv_id, turn_idx, text) -> (doc_id, conv_id, turn_idx, dl, salt)."""

    def __init__(self, config: AnalyzerConfig = DEFAULT_CONFIG, salt_bits: int = 2):
        self.config = config
        self.salt_bits = salt_bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        # dl counts every occurrence of non-stopword tokens; vectorized:
        # Python touches only the batch's unique tokens
        uniq, codes, lens, n = token_codes_batch(batch["text"])
        use_stop = self.config.use_stopwords
        drop = np.zeros(max(1, len(uniq)), bool)
        for u, tok in enumerate(uniq):
            drop[u] = (not tok) or (use_stop and tok in STOPWORDS)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        kept = ~drop[codes]
        dls = np.bincount(doc_of[kept], minlength=n).astype(np.int32)
        ids = doc_keys_batch(batch["conv_id"], batch["turn_idx"])
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
        if "doc_id" in batch.column_names:
            # precomputed ids (dense assignment — index_build's
            # doc_id_mode="dense"); top salt_bits must still be the salt
            ids = batch["doc_id"].to_numpy().astype(np.uint64)
        else:
            ids = doc_keys_batch(batch["conv_id"], batch["turn_idx"])
        shift = np.uint64(63 - self.salt_bits)
        with_pos = self.with_positions
        P = self.term_parts

        # Vectorized M1-M8 over the whole batch (see analyze_batch):
        # (doc, stem) pair rows with tf / count / flat ascending positions.
        (
            dls,
            pair_doc,
            pair_stem,
            stems,
            pair_count,
            pair_tf,
            pos_sorted,
            pair_pos_start,
        ) = analyze_batch(batch["text"], self.config, with_pos)

        gkeys: list[int] = []
        salts: list[int] = []
        terms: list[str] = []
        docs_b: list[bytes] = []
        tfs_b: list[bytes] = []
        npos_b: list[bytes] = []
        pos_b: list[bytes] = []
        extra_b: list[bytes] = []

        if pair_doc.size:
            # order pairs by (stem, doc_id): per-stem runs arrive doc-
            # ascending with contiguous salt ranges (salt = top id bits)
            pdid = ids[pair_doc]
            o2 = np.lexsort((pdid, pair_stem))
            f_stem = pair_stem[o2]
            f_did = pdid[o2]
            f_tf = pair_tf[o2]
            f_salt = (f_did >> shift).astype(np.int64)
            if with_pos:
                f_cnt = pair_count[o2].astype(np.uint32)
                # gather each pair's position slice into fragment order
                tot = int(pair_count.sum())
                gidx = (
                    np.repeat(
                        pair_pos_start[o2] - _cumsum_excl(pair_count[o2]),
                        pair_count[o2],
                    )
                    + np.arange(tot, dtype=np.int64)
                )
                f_pos = pos_sorted[gidx].astype(np.uint32)
                f_pends = np.cumsum(f_cnt, dtype=np.int64)

            # fragment rows = runs of constant (stem, salt)
            change = np.empty(f_stem.size, bool)
            change[0] = True
            np.not_equal(f_stem[1:], f_stem[:-1], out=change[1:])
            change[1:] |= f_salt[1:] != f_salt[:-1]
            starts = np.flatnonzero(change)
            ends = np.concatenate((starts[1:], [f_stem.size]))
            kp_of = np.asarray([term_part(s, P) for s in stems], np.int64)
            for lo, hi in zip(starts, ends):
                sid = int(f_stem[lo])
                s = int(f_salt[lo])
                gkeys.append(s * P + int(kp_of[sid]))
                salts.append(s)
                terms.append(stems[sid])
                docs_b.append(f_did[lo:hi].tobytes())
                tfs_b.append(f_tf[lo:hi].tobytes())
                if with_pos:
                    npos_b.append(f_cnt[lo:hi].tobytes())
                    plo = 0 if lo == 0 else int(f_pends[lo - 1])
                    pos_b.append(f_pos[plo : int(f_pends[hi - 1])].tobytes())
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
