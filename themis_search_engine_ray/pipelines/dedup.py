"""Deduplication operators for training-data pipelines (Ray Data).

Five dedup families over an (id, text) / embedding table, each built
from shuffle-conscious primitives:

* exact            — content-hash in ``map_batches`` (vectorized md5),
                     then ``groupby(hash).aggregate(Min(id))``; the
                     shuffle moves 16-byte hashes, never text.
* n-gram Jaccard   — all-pairs similarity via a shingle inverted
                     index: (shingle, doc) rows → groupby(shingle) →
                     star-capped candidate pairs → exact-Jaccard
                     verification. Every emitted (pair, jaccard) is
                     exact; discovery is complete while every shingle's
                     posting list stays ≤ _MAX_CLIQUE (guaranteed on
                     non-degenerate corpora), and degrades to
                     hub-connected components past it instead of an
                     O(n²) group task.
* MinHash + LSH    — shingle → 64-perm minhash signature (vectorized
                     affine hashing) → banded buckets →
                     groupby(band, bucket) candidate pairs → exact
                     Jaccard verification. Linear shuffle volume
                     (#docs × #bands fixed-width rows).
* SimHash          — 64-bit weighted-majority signature; candidate
                     blocking on 4×16-bit sub-bands (all pairs at
                     hamming ≤ 3 share ≥1 exact sub-band by pigeonhole
                     when ≤3 bands differ ... with 4 bands any pair at
                     hamming ≤3 collides in ≥1 band), verify hamming.
* embedding cosine — exact pairs with cosine ≥ τ via a distributed
                     blocked cross product over object-store chunk
                     refs (no driver-held matrix); plus an LSH
                     variant (random hyperplanes → banded buckets →
                     exact-cosine verify) for sub-quadratic candidate
                     discovery with documented recall.

Determinism: every pair output is (a < b); jaccard/cosine rounded to 6
decimals for hash-comparable oracles; thresshold comparisons happen on
the unrounded float64 value identically in engine and SQL oracle.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from ..functions.rounding import round_half_up

_WORD_RE = re.compile(r"[a-z0-9]+")

_MERSENNE = (1 << 61) - 1
_N_PERM = 64
_BANDS = 16
_ROWS_PER_BAND = _N_PERM // _BANDS


def _shingles(text: str, k: int = 3) -> set[str]:
    toks = _WORD_RE.findall((text or "").lower())
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


# ------------------------------------------- vectorized batch shingling
#
# Candidate discovery (LSH banding, shingle inverted index) runs off
# 64-bit shingle HASHES computed whole-batch: one blake2b per UNIQUE
# token (memoized — corpus vocabularies are small), then a rolling
# polynomial combine over the flat token-hash array as numpy ops. The
# per-doc Python loop this replaces (regex findall + " ".join + blake2b
# per shingle) was the minhash bench stage's whole cost. Hash collisions
# can only ADD candidates (same shingle always maps to the same hash),
# and every candidate is exact-verified downstream, so pair outputs are
# unchanged in distribution; _shingles (string sets) remains the
# verification currency.

_TOKEN_HASH_CACHE: dict[str, int] = {}
_TOKEN_HASH_CACHE_MAX = 1 << 20
_SHINGLE_B = np.uint64(1099511628211)  # FNV prime as the rolling base


def shingle_hash_str(s: str) -> int:
    """The 64-bit hash :func:`_shingle_hashes_batch` assigns to the
    shingle whose string form is ``s`` (tokens joined by single
    spaces): the same rolling polynomial over per-token hashes,
    computed from the string side. Lets a small string-shingle set
    (e.g. a broadcast benchmark set) be probed against batch hashes."""
    # plain-int arithmetic masked to 64 bits: numpy uint64 scalar ops
    # emit per-call RuntimeWarnings on wraparound (and raise under
    # -W error), which this hot loop must not
    h = 0
    b = int(_SHINGLE_B)
    for tok in s.split(" "):
        h = (h * b + _token_hash_cached(tok)) & 0xFFFFFFFFFFFFFFFF
    return h


def _token_hash_cached(tok: str) -> int:
    h = _TOKEN_HASH_CACHE.get(tok)
    if h is None:
        h = _hash64(tok)
        if len(_TOKEN_HASH_CACHE) < _TOKEN_HASH_CACHE_MAX:
            _TOKEN_HASH_CACHE[tok] = h
    return h


def _token_hash_codes(text_col):
    """(doc_of, token_hashes u64, n_docs) over the normalized token
    stream — tokenization identical to ``_WORD_RE.findall(text.lower())``
    (runs of [a-z0-9] of the LOWERED text — ``lower_first=True``, so a
    Unicode char whose lowercase maps into ASCII tokenizes the same as
    in the scalar verify/oracle paths); '' split artifacts dropped."""
    from ..stages.tokenize import token_codes_batch

    uniq, codes, lens, n = token_codes_batch(text_col, lower_first=True)
    th = np.fromiter(
        (_token_hash_cached(t) if t else 0 for t in uniq), np.uint64, len(uniq)
    )
    real = np.fromiter((bool(t) for t in uniq), bool, len(uniq))
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    if len(uniq):
        keep = real[codes]
        return doc_of[keep], th[codes[keep]], n
    return doc_of, np.empty(0, np.uint64), n


def _shingle_hashes_batch(
    text_col, k: int, return_token_counts: bool = False
):
    """Per-doc DEDUPED k-gram shingle hashes for a whole Arrow text
    column: returns (doc_idx, shingle_hash u64, n_docs), doc_idx
    ascending (shingle order within a doc unspecified — callers treat
    them as sets). With ``return_token_counts=True`` a fourth element —
    per-doc token counts — is appended, sparing callers that need both
    a second full tokenize pass."""
    doc_of, th, n = _token_hash_codes(text_col)

    def _ret(d, h):
        if return_token_counts:
            return d, h, n, np.bincount(doc_of, minlength=n).astype(np.int64)
        return d, h, n

    m = th.size
    if m < k:
        return _ret(np.empty(0, np.int64), np.empty(0, np.uint64))
    nw = m - k + 1
    h = np.zeros(nw, np.uint64)
    for j in range(k):
        h = h * _SHINGLE_B + th[j : j + nw]
    valid = doc_of[:nw] == doc_of[k - 1 :]
    d = doc_of[:nw][valid]
    h = h[valid]
    # dedupe (doc, hash) — sort + unique-run mask keeps doc_idx ascending
    order = np.lexsort((h, d))
    d, h = d[order], h[order]
    first = np.ones(d.size, bool)
    if d.size:
        first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    return _ret(d[first], h[first])


def _minhash_params(seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=_N_PERM, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=_N_PERM, dtype=np.int64).astype(np.uint64)
    return a, b


_MH_A, _MH_B = _minhash_params()


_MAX_CLIQUE = 512


def _pair_indices(n: int, max_clique: int = _MAX_CLIQUE):
    """Candidate-pair index arrays for one LSH bucket.

    All pairs below the cap; above it, a star (min element vs rest) —
    a degenerate bucket (e.g. thousands of identical or empty docs all
    sharing a band signature) then costs O(n) rows instead of an O(n²)
    clique that would OOM the group task at corpus scale. Duplicate
    *components* stay connected through the hub, which is what dedup
    needs; only the explicit pair enumeration inside a giant
    near-identical cluster is elided (and logged by the count)."""
    if n <= max_clique:
        return np.triu_indices(n, k=1)
    a = np.zeros(n - 1, np.int64)
    b = np.arange(1, n, dtype=np.int64)
    return a, b


# Coarse reduce shards for candidate emission. The exact bucket key
# (shingle hash / LSH band signature) has ~one group per DISTINCT key —
# at corpus scale that is millions of per-group Python calls through
# groupby().map_groups. Instead rows shuffle into n_shards coarse
# groups (key-hash mod) and each group finds its exact-bucket
# boundaries vectorized; Python iterates only over buckets that
# actually collide (>= 2 docs). The default (64) suits single-node runs;
# on a cluster size n_shards ~ total_rows / rows-per-reducer-heap (it
# caps both reduce parallelism and per-group memory — a bucket never
# splits across shards, so correctness is shard-count independent).
_PAIR_SHARDS = 64


def _emit_pairs_sharded(
    rows,
    key_cols: list[str],
    n_shards: int = _PAIR_SHARDS,
    dedupe: bool = True,
    max_clique: int = _MAX_CLIQUE,
):
    """rows: Dataset with ``doc_id`` + ``key_cols`` (int-typed), one row
    per (doc, key). Returns the candidate (a, b) Dataset: docs sharing
    an exact key value, star-capped per bucket (:func:`_pair_indices`),
    a < b. ``dedupe=False`` skips the global ``groupby(a, b)``
    dedup shuffle — pairs found via multiple keys/bands then appear
    multiple times; pass it when the consumer dedupes anyway (the scan
    verifier materializes candidates driver-side and dedupes for free,
    saving one all-to-all per dedup pipeline)."""

    def add_shard(batch: pa.Table) -> pa.Table:
        acc = np.zeros(len(batch), np.uint64)
        for c in key_cols:
            # splitmix64-style mix so band ids / low-entropy columns
            # spread across shards
            v = batch[c].to_numpy().astype(np.uint64, copy=False)
            acc ^= (v + np.uint64(0x9E3779B97F4A7C15) + (acc << np.uint64(6))
                    + (acc >> np.uint64(2)))
        return batch.append_column(
            "shard", pa.array((acc % np.uint64(n_shards)).astype(np.int64))
        )

    empty = pa.Table.from_pydict({"a": [], "b": []}).cast(
        pa.schema([("a", pa.int64()), ("b", pa.int64())])
    )

    def emit(group: pa.Table) -> pa.Table:
        docs = group["doc_id"].to_numpy()
        if docs.size < 2:
            return empty
        keys = [group[c].to_numpy() for c in key_cols]
        order = np.lexsort((docs, *reversed(keys)))
        docs = docs[order]
        keys = [k[order] for k in keys]
        new = np.zeros(docs.size, bool)
        new[0] = True
        for k in keys:
            new[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], docs.size)
        big = (ends - starts) >= 2
        if not big.any():
            return empty
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(starts[big], ends[big]):
            ids = docs[s:e]  # sorted asc (secondary lexsort key)
            if ids[0] == ids[-1]:  # all one doc
                continue
            ids = ids[np.concatenate(([True], ids[1:] != ids[:-1]))]
            if ids.size < 2:
                continue
            ai, bi = _pair_indices(ids.size, max_clique)
            out_a.append(ids[ai])
            out_b.append(ids[bi])
        if not out_a:
            return empty
        return pa.Table.from_pydict(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    out = (
        rows.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(emit, batch_format="pyarrow")
    )
    if dedupe:
        # dedupe candidates found via multiple keys/bands
        out = out.groupby(["a", "b"]).count()
    return out


def _in_sorted(haystack: np.ndarray, needles: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``needles`` in the SORTED ``haystack``
    (searchsorted probe — the shared idiom for broadcast-set filters)."""
    out = np.zeros(needles.size, bool)
    if haystack.size == 0 or needles.size == 0:
        return out
    pos = np.searchsorted(haystack, needles)
    inr = pos < haystack.size
    out[inr] = haystack[pos[inr]] == needles[inr]
    return out


def _collect_unique_pairs(candidates) -> np.ndarray:
    """Materialize a candidate (a, b) Dataset to the driver as a
    DEDUPED (n, 2) array. Each batch is uniqued BEFORE accumulating, so
    driver memory is bounded by (unique pairs + one batch) even when
    the emitters ship one copy per matching band/key
    (``_emit_pairs_sharded(dedupe=False)``)."""
    acc: np.ndarray | None = None
    for batch in candidates.iter_batches(batch_size=65536, batch_format="pyarrow"):
        chunk = np.unique(
            np.stack(
                [batch["a"].to_numpy(), batch["b"].to_numpy()], axis=1
            ),
            axis=0,
        )
        acc = chunk if acc is None else np.unique(
            np.concatenate([acc, chunk]), axis=0
        )
    return acc if acc is not None else np.empty((0, 2), np.int64)


def _minhash_vals(x: np.ndarray) -> np.ndarray:
    """(P, m) permutation values for minhash: ``A·x + B`` folded mod the
    Mersenne prime 2^61-1. The multiply wraps mod 2^64 (numpy uint64
    semantics); two shift-add folds stand in for ``%`` — the uint64
    modulo costs a hardware divide per element (measured ~175 ns/elem,
    i.e. the entire band_rows budget at large batches), the folds are
    ~10x cheaper and preserve the family's hash quality (min is taken
    over the full value, candidates remain exact-verified)."""
    P = np.uint64(_MERSENNE)
    t = _MH_A[:, None] * x[None, :]
    t += _MH_B[:, None]
    v = (t & P) + (t >> np.uint64(61))
    v = (v & P) + (v >> np.uint64(61))
    return v


def minhash_signature(sh_hashes: np.ndarray) -> np.ndarray:
    """64-perm minhash of a set of 64-bit shingle hashes (vectorized)."""
    if sh_hashes.size == 0:
        return np.full(_N_PERM, np.uint64(_MERSENNE), dtype=np.uint64)
    x = sh_hashes.astype(np.uint64) % np.uint64(_MERSENNE)
    return _minhash_vals(x).min(axis=1)


# ---------------------------------------------------------------- exact


def _utf8_slices(arr):
    """(offsets int64 ndarray, data memoryview) of an Arrow string
    array, nulls normalized to empty slices — feeds hashing straight
    from the Arrow buffer, skipping ``to_pylist`` + ``str.encode``
    (measured ~1.8x on the md5 pass)."""
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
    bufs = arr.buffers()
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        offs = np.frombuffer(bufs[1], np.int64, len(arr) + 1, offset=arr.offset * 8)
    else:
        offs = np.frombuffer(
            bufs[1], np.int32, len(arr) + 1, offset=arr.offset * 4
        ).astype(np.int64)
    return offs, memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")


def md5_digests(texts) -> bytes:
    """Concatenated raw 16-byte md5 digests of a text sequence (list
    with None → "" or an Arrow string array, hashed straight from its
    buffer). The per-row md5 is irreducible; everything around it is
    one pass."""
    md5 = hashlib.md5
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        offs, data = _utf8_slices(texts)
        return b"".join(
            md5(data[s:e]).digest()
            for s, e in zip(offs[:-1].tolist(), offs[1:].tolist())
        )
    return b"".join(md5((t or "").encode()).digest() for t in texts)


def md5_hex_array(texts) -> pa.Array:
    """Vectorized md5-hex of a text sequence (list[str|None], None →
    "", or an Arrow string array hashed zero-copy from its buffer) —
    THE exact-dedup content-hash rule, shared with curate. One md5 per
    row is irreducible; the hex column is built in bulk (digests
    joined into one buffer, one hexlify pass, zero-copy StringArray)
    instead of a per-row hexdigest+str. Batches must stay under int32
    string offsets (~67M rows — far above any map_batches block)."""
    import binascii

    n = len(texts)
    if not n:
        return pa.array([], pa.string())
    assert n < 16_000_000, "chunk the batch before hashing"
    buf = md5_digests(texts)
    offs = np.arange(0, 32 * (n + 1), 32, dtype=np.int32)
    return pa.StringArray.from_buffers(
        n,
        pa.py_buffer(offs.tobytes()),
        pa.py_buffer(binascii.hexlify(buf)),
    )


def exact_dedup(sf_dir: str):
    """Kept doc per distinct text (min doc_id) — (doc_id, text_hash)."""
    import ray.data as rd
    from ray.data.aggregate import Min

    def add_hash(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch["doc_id"], md5_hex_array(batch["text"])],
            names=["doc_id", "text_hash"],
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id", "text_hash"])
    )


def source_overlap(sf_dir: str, k: int = 3, num_shards: int = 64):
    """Pairwise source contamination matrix at word-``k``-gram
    granularity: for every source pair ``src_a <= src_b``, the number
    of DISTINCT shingles present in both (the diagonal ``a == b`` is
    each source's distinct-shingle count). Output:
    (src_a, src_b, n_shared).

    Shape: each batch reduces to its distinct (shingle, source)
    combinations — deduped on integer token-code triples FIRST, so
    shingle strings and md5 keys are built only for the reduced set —
    then ONE coarse shard exchange on the md5 byte (never a per-shingle
    groupby: millions of tiny groups is the round-3 anti-pattern).
    Inside a shard, equal-key runs are found by lexsort + neighbor
    diff; single-source shingles (the overwhelming majority) fold into
    the diagonal via one ``bincount``, and only genuinely shared
    shingles (runs of length > 1, bounded by the cross-source dup
    mass) expand to explicit pairs. A final bounded
    ``groupby((src_a, src_b)).sum`` merges the ≤ C(S+1, 2)-row shard
    partials. md5 keys make hash collisions impossible in practice, so
    the distinct-shingle counts match the string-level SQL twin
    exactly; NULL sources count under ``""`` (the mixing key rule)."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.tokenize import kept_token_codes

    def emit(batch: pa.Table) -> pa.Table:
        uniq, codes, doc_of, n = kept_token_codes(batch["text"], lower_first=True)
        src_col = pc.fill_null(batch["source"], "")
        if isinstance(src_col, pa.ChunkedArray):
            src_col = src_col.combine_chunks()
        dsrc = src_col.dictionary_encode()
        src_names = dsrc.dictionary.to_pylist()
        doc_src = dsrc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        m = codes.size
        if m < k:
            return pa.Table.from_pydict(
                {
                    "h": pa.array([], pa.string()),
                    "src": pa.array([], pa.string()),
                    "shard": pa.array([], pa.int64()),
                }
            )
        nw = m - k + 1
        valid = doc_of[:nw] == doc_of[k - 1 :]
        tri = np.stack(
            [doc_src[doc_of[:nw][valid]]]
            + [codes[j : j + nw][valid] for j in range(k)],
            axis=1,
        )
        tri = np.unique(tri, axis=0)  # distinct (source, token-code-triple)
        strings = [
            " ".join(uniq[c] for c in row[1:]) for row in tri.tolist()
        ]
        digests = md5_digests(strings)
        shard = (
            np.frombuffer(digests, np.uint8)[::16].astype(np.int64) % num_shards
        )
        return pa.Table.from_pydict(
            {
                "h": md5_hex_array(strings),
                "src": pa.array([src_names[r] for r in tri[:, 0].tolist()]),
                "shard": shard,
            }
        )

    def reduce_shard(group: pa.Table) -> pa.Table:
        h = np.asarray(group["h"].to_pylist(), dtype=object)
        src = pc.fill_null(group["src"], "")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        dsrc = src.dictionary_encode()
        names = np.asarray(dsrc.dictionary.to_pylist(), dtype=object)
        rank = np.empty(len(names), np.int64)
        rank[np.argsort(names, kind="stable")] = np.arange(len(names))
        sc = rank[dsrc.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
        order = np.lexsort((sc, h))
        h, sc = h[order], sc[order]
        # distinct (h, src) rows (batches may repeat a combination)
        first = np.ones(h.size, bool)
        if h.size:
            first[1:] = (h[1:] != h[:-1]) | (sc[1:] != sc[:-1])
        h, sc = h[first], sc[first]
        new_h = np.ones(h.size, bool)
        if h.size:
            new_h[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new_h)
        runlen = np.diff(np.append(starts, h.size))
        sorted_names = names[np.argsort(names, kind="stable")]  # name at rank i
        # diagonal: every distinct (h, src) adds 1 to (src, src)
        diag = np.bincount(sc, minlength=len(names)).astype(np.int64)
        pair_counts: dict = {}
        for s, m_ in zip(starts[runlen > 1].tolist(), runlen[runlen > 1].tolist()):
            run = sc[s : s + m_]  # ascending, distinct sources
            for i in range(m_):
                for j in range(i + 1, m_):
                    key = (run[i], run[j])
                    pair_counts[key] = pair_counts.get(key, 0) + 1
        a = [sorted_names[i] for i in range(len(names)) if diag[i]]
        b = list(a)
        n_ = [int(diag[i]) for i in range(len(names)) if diag[i]]
        for (i, j), c in sorted(pair_counts.items()):
            a.append(sorted_names[i])
            b.append(sorted_names[j])
            n_.append(c)
        return pa.Table.from_pydict(
            {
                "src_a": pa.array(a, pa.string()),
                "src_b": pa.array(b, pa.string()),
                "n": pa.array(n_, pa.int64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "source"])
    return (
        ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(reduce_shard, batch_format="pyarrow")
        .groupby(["src_a", "src_b"])
        .aggregate(Sum("n", alias_name="n_shared"))
    )


def dedup_rate_by_source(sf_dir: str):
    """Per-source duplication diagnostic: document count, distinct-text
    count, and the duplicate fraction ``1 − distinct/docs`` (rounded to
    6) — the first number a curation run reports per ingest source.
    Output: (source, n_docs, n_distinct, dup_rate).

    Two bounded aggregations: (1) per-batch (source → doc count)
    combiner (≤ #sources rows per batch); (2) the exact-dedup content
    hash per row → ``groupby((text_hash, source)).count`` — the same
    corpus-keyed shuffle :func:`exact_dedup` already pays — whose
    output collapses through a second ≤ #sources-rows combiner to
    distinct-text counts. The two tiny tables meet on the driver
    (≤ #sources rows each); the division is one float op per source,
    identical to the SQL twin. NULL sources count under ``""``."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "source"])

    def tag(batch: pa.Table) -> pa.Table:
        src = pc.fill_null(batch["source"], "")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        return pa.Table.from_arrays(
            [md5_hex_array(batch["text"]), src], names=["text_hash", "source"]
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def src_counts(batch: pa.Table) -> pa.Table:
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = src.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uc, cnt = np.unique(codes, return_counts=True)
        return pa.Table.from_arrays(
            [d.dictionary.take(pa.array(uc)), pa.array(cnt.astype(np.int64))],
            names=["source", "n"],
        )

    docs = (
        tagged.map_batches(src_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n", alias_name="n_docs"))
        .to_pandas()
    )
    distinct = (
        tagged.groupby(["text_hash", "source"])
        .aggregate(Count(alias_name="c"))
        .map_batches(src_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n", alias_name="n_distinct"))
        .to_pandas()
    )
    merged = docs.merge(distinct, on="source").sort_values("source")
    nd = merged["n_docs"].to_numpy().astype(np.int64)
    nu = merged["n_distinct"].to_numpy().astype(np.int64)
    rate = round_half_up(1.0 - nu.astype(np.float64) / nd.astype(np.float64), 6)
    return pa.Table.from_pydict(
        {
            "source": pa.array(merged["source"].tolist(), pa.string()),
            "n_docs": nd,
            "n_distinct": nu,
            "dup_rate": rate,
        }
    )


def ngram_novelty(sf_dir: str, k: int = 3, max_shared: int = 50_000_000):
    """Per-document novelty score: the fraction of a document's
    DISTINCT word-``k``-gram shingles that appear in NO other document
    — the "favor novel content" curation signal (dup-heavy boilerplate
    scores near 0, fresh text near 1). Output: (doc_id, n_shingles,
    novelty) for documents with ≥ 1 shingle; novelty rounded to 6.

    Two passes: (1) per-batch distinct (shingle, doc) collapse to
    (shingle-md5, count) partials → one ``groupby.sum`` → only
    shingles with count ≥ 2 (the SHARED set — the duplicated tail,
    orders of magnitude smaller than the vocabulary of shingles) come
    back and are broadcast once via ``ray.put`` as a sorted key array;
    (2) each batch recomputes its docs' distinct shingles and probes
    the broadcast keys with one ``searchsorted`` per batch. Shingles
    are keyed by md5 on both sides, so the count — and therefore the
    score — is exact vs the string-level SQL twin. Guarded by
    ``max_shared``: past it, swap the broadcast probe for the
    fully distributed gram-occurrence exchange already built for
    :func:`~.spans.span_dedup` (same (gram → doc) groupby, mask
    shipped back by bucket instead of a driver set)."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.tokenize import kept_token_codes

    def _doc_shingle_digests(batch: pa.Table):
        """(doc_row_idx, digest16-hex array) of the batch's DISTINCT
        (doc, shingle) combinations — dedup on integer token triples
        before any string/md5 work (the source_overlap altitude)."""
        uniq, codes, doc_of, n = kept_token_codes(batch["text"], lower_first=True)
        m = codes.size
        if m < k:
            return np.empty(0, np.int64), []
        nw = m - k + 1
        valid = doc_of[:nw] == doc_of[k - 1 :]
        tri = np.stack(
            [doc_of[:nw][valid]] + [codes[j : j + nw][valid] for j in range(k)],
            axis=1,
        )
        tri = np.unique(tri, axis=0)
        strings = [" ".join(uniq[c] for c in row[1:]) for row in tri.tolist()]
        return tri[:, 0], strings

    def count_partial(batch: pa.Table) -> pa.Table:
        docs, strings = _doc_shingle_digests(batch)
        if not strings:
            return pa.Table.from_pydict(
                {"h": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        h = np.asarray(md5_hex_array(strings), dtype=object)
        uh, cnt = np.unique(h, return_counts=True)
        return pa.Table.from_pydict(
            {"h": pa.array(uh.tolist(), pa.string()), "c": cnt.astype(np.int64)}
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    shared_tab = (
        ds.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Sum("c", alias_name="c"))
        .map_batches(
            lambda b: b.filter(pc.greater_equal(b["c"], 2)).select(["h"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()  # the duplicated tail only — NOT the shingle vocab
    )
    if len(shared_tab) > max_shared:
        raise ValueError(
            f"shared-shingle set ({len(shared_tab)} rows) exceeds max_shared="
            f"{max_shared}; use the distributed gram-occurrence exchange "
            "(spans.span_dedup machinery) instead of the broadcast probe"
        )
    shared_sorted = np.sort(shared_tab["h"].to_numpy().astype(object))
    ref = ray.put(shared_sorted)

    def score(batch: pa.Table) -> pa.Table:
        shared = ray.get(ref)
        docs, strings = _doc_shingle_digests(batch)
        if not strings:
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_shingles": pa.array([], pa.int64()),
                    "novelty": pa.array([], pa.float64()),
                }
            )
        h = np.asarray(md5_hex_array(strings), dtype=object)
        if shared.size:
            pos = np.searchsorted(shared, h)
            pos[pos >= shared.size] = shared.size - 1
            is_shared = shared[pos] == h
        else:
            is_shared = np.zeros(h.size, bool)
        nd = int(docs.max()) + 1 if docs.size else 0
        tot = np.bincount(docs, minlength=nd).astype(np.float64)
        shr = np.bincount(docs[is_shared], minlength=nd).astype(np.float64)
        has = tot > 0
        ids = batch["doc_id"].to_numpy().astype(np.int64)[:nd][has]
        t_, s_ = tot[has], shr[has]
        return pa.Table.from_pydict(
            {
                "doc_id": ids,
                "n_shingles": t_.astype(np.int64),
                "novelty": round_half_up((t_ - s_) / t_, 6),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------- n-gram Jaccard


def ngram_jaccard_pairs(
    sf_dir: str, threshold: float = 0.5, k: int = 3, verify: str = "auto"
):
    """Word-k-gram Jaccard >= threshold pairs via a shingle inverted index.

    (shingle, doc) rows → sharded candidate emission
    (:func:`_emit_pairs_sharded`; star-capped at ``_MAX_CLIQUE`` docs
    per shingle, same contract as the LSH bucket
    cap) → candidate dedupe → exact-Jaccard verification
    (:func:`_verify_jaccard_pairs`; ``verify="auto"`` picks the fully
    distributed join path past ``_VERIFY_SCAN_MAX_PAIRS`` candidates).
    Jaccard values are computed from the true shingle sets, so every
    emitted row is exact; a shingle shared by 100k documents costs O(n)
    candidate rows instead of an O(n²) clique in one group task.
    """
    import ray.data as rd

    def shingle_rows(batch: pa.Table) -> pa.Table:
        # 64-bit shingle HASHES, vectorized — the shuffle moves 8-byte
        # ints instead of shingle strings; a hash collision can only add
        # a candidate pair, which exact verification then drops
        d_idx, sh, _ = _shingle_hashes_batch(batch["text"], k)
        ids = batch["doc_id"].to_numpy()[d_idx]
        return pa.Table.from_arrays(
            [pa.array(ids), pa.array(sh.view(np.int64))],
            names=["doc_id", "sh"],
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    candidates = _emit_pairs_sharded(
        ds.map_batches(shingle_rows, batch_format="pyarrow", zero_copy_batch=True),
        ["sh"],
        dedupe=False,  # the verifier dedupes (scan: driver-side for free)
    )
    return _verify_jaccard_pairs(ds, candidates, threshold, k, verify)


def _jaccard_rows(a, b, sets_a, sets_b, threshold: float):
    keep_a, keep_b, jacs = [], [], []
    for x, y, sx, sy in zip(a, b, sets_a, sets_b):
        if not sx and not sy:
            continue
        inter = len(sx & sy)
        jac = inter / (len(sx) + len(sy) - inter)
        if jac >= threshold:
            keep_a.append(x)
            keep_b.append(y)
            jacs.append(round_half_up(jac, 6))
    return pa.Table.from_pydict(
        {
            "a": pa.array(keep_a, pa.int64()),
            "b": pa.array(keep_b, pa.int64()),
            "jaccard": pa.array(jacs, pa.float64()),
        }
    )


# Above this many candidate pairs the driver-bounded scan verify (which
# holds the candidate doc-id set and their shingle sets on the driver)
# hands off to the fully distributed join verify. ~2M pairs ≈ tens of
# MB of ids + sets — comfortably inside one driver; past it, nothing
# should ever centralize. Override via the verify= parameter.
_VERIFY_SCAN_MAX_PAIRS = 2_000_000


def _verify_jaccard_pairs(ds, candidates, threshold: float, k: int, verify: str):
    """Dispatch exact-Jaccard verification of candidate (a, b) pairs.

    ``candidates`` may contain DUPLICATE pairs (the emitters skip the
    global dedup shuffle, ``_emit_pairs_sharded(dedupe=False)``): the
    scan path dedupes driver-side for free while collecting the pairs;
    the join/broadcast paths restore the distributed ``groupby(a, b)``
    dedup first. ``"auto"`` (the documented scale default): count the
    candidates and use the driver-bounded ``"scan"`` below
    ``_VERIFY_SCAN_MAX_PAIRS``, the fully distributed ``"join"`` above
    it (the duplicate-inflated count only biases the choice toward the
    distributed path — conservative). All modes produce identical
    pairs (tests/test_degenerate.py asserts scan == join on the sf
    corpus)."""
    if verify == "auto":
        candidates = candidates.select_columns(["a", "b"]).materialize()
        verify = (
            "join" if candidates.count() > _VERIFY_SCAN_MAX_PAIRS else "scan"
        )
    if verify == "scan":
        return _scan_verify_jaccard(ds, candidates, threshold, k)
    candidates = candidates.select_columns(["a", "b"]).groupby(["a", "b"]).count()
    if verify == "join":
        return _join_verify_jaccard(ds, candidates, threshold, k)
    if verify == "broadcast":
        return _broadcast_verify_jaccard(ds, candidates, threshold, k)
    raise ValueError(f"unknown verify mode {verify!r}")


def _broadcast_verify_jaccard(ds, candidates, threshold: float, k: int):
    """Ship ALL docs' shingle sets via ray.put (tiny corpora only)."""
    import ray

    shingle_map = {}
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for did, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            shingle_map[did] = _shingles(t, k)
    sh_ref = ray.put(shingle_map)

    def verify_broadcast(batch: pa.Table) -> pa.Table:
        smap = ray.get(sh_ref)
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        return _jaccard_rows(
            a, b, [smap[x] for x in a], [smap[y] for y in b], threshold
        )

    return candidates.map_batches(verify_broadcast, batch_format="pyarrow")


# Reduce buckets for the distributed verify's tag-union joins. Each
# groupby group holds ~payload_rows/NB payload rows plus the candidate
# rows hashing there; the bucket count SCALES with the payload so a
# group stays ~_JOIN_BUCKET_ROWS rows no matter the corpus (a constant
# count would concentrate corpus/NB rows per reducer — unbounded at
# 100 TB), with a floor that keeps small runs from degenerating into
# one giant group per few rows.
_JOIN_BUCKET_ROWS = 1_000_000  # target payload rows per reduce bucket
_JOIN_BUCKETS_MIN = 64


def _join_bucket_count(payload_rows: int) -> int:
    return max(_JOIN_BUCKETS_MIN, -(-payload_rows // _JOIN_BUCKET_ROWS))


def _attach_pair_payloads(payload_ds, candidates, ptype=None):
    """Attach a per-doc payload to both sides of a candidate-pair
    Dataset, fully distributed — no driver-side state at all.

    ``payload_ds``: (doc_id:int64, pay:<ptype>) — one payload row per
    document (string or binary). ``candidates``: (a, b). Returns a
    Dataset (a, b, pay_a, pay_b).

    Two bucketed tag-union reduce-side joins attach each pair's payload
    for ``a`` then ``b`` (the same pattern graph.py uses: Ray 2.49's
    ``Dataset.join`` deadlocks/mis-resolves when executed repeatedly in
    a session, see NOTES.md). Rows are bucketed on
    ``key % n_buckets`` (bucket count scaled to the payload size, see
    :func:`_join_bucket_count`); each group does one vectorized dict
    lookup, so per-group Python cost is O(group), not O(1)-per-doc."""
    if ptype is None:
        ptype = pa.string()
    empty_pay = b"" if ptype == pa.binary() else ""

    payload_ds = payload_ds.materialize()  # reused by both attach rounds
    n_buckets = _join_bucket_count(payload_ds.count())  # count() is free here

    _SCHEMA = pa.schema(
        [
            ("bucket", pa.int64()),
            ("key", pa.int64()),
            ("a", pa.int64()),
            ("b", pa.int64()),
            ("pay_a", ptype),
            ("pay", ptype),
            ("tag", pa.int8()),
        ]
    )

    def _set_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        n = len(ids)
        return pa.Table.from_pydict(
            {
                "bucket": ids % n_buckets,
                "key": ids,
                "a": np.zeros(n, np.int64),
                "b": np.zeros(n, np.int64),
                "pay_a": pa.array([empty_pay] * n, ptype),
                "pay": batch["pay"],
                "tag": np.zeros(n, np.int8),
            }
        ).cast(_SCHEMA)

    def _pair_rows(key_col: str, pay_a_col: bool):
        def fn(batch: pa.Table) -> pa.Table:
            keys = batch[key_col].to_numpy()
            n = len(keys)
            return pa.Table.from_pydict(
                {
                    "bucket": keys % n_buckets,
                    "key": keys,
                    "a": batch["a"],
                    "b": batch["b"],
                    "pay_a": batch["pay_a"]
                    if pay_a_col
                    else pa.array([empty_pay] * n, ptype),
                    "pay": pa.array([empty_pay] * n, ptype),
                    "tag": np.ones(n, np.int8),
                }
            ).cast(_SCHEMA)

        return fn

    def _attach(group: pa.Table, out_col: str) -> pa.Table:
        tags = group["tag"].to_numpy()
        sidx = np.flatnonzero(tags == 0)
        pidx = np.flatnonzero(tags == 1)
        if pidx.size == 0:
            return pa.Table.from_pydict(
                {"a": [], "b": [], "pay_a": [], out_col: []},
                pa.schema(
                    [(c, pa.int64() if c in ("a", "b") else ptype)
                     for c in ("a", "b", "pay_a", out_col)]
                ),
            )
        keys = group["key"].to_numpy()
        pay = group["pay"].to_pylist()
        lut = {int(keys[i]): pay[i] for i in sidx}
        pk = keys[pidx]
        return pa.Table.from_pydict(
            {
                "a": group["a"].take(pa.array(pidx)),
                "b": group["b"].take(pa.array(pidx)),
                "pay_a": group["pay_a"].take(pa.array(pidx)),
                out_col: pa.array(
                    [lut.get(int(x), empty_pay) for x in pk], ptype
                ),
            }
        )

    cand = candidates.select_columns(["a", "b"])
    round1 = (
        payload_ds.map_batches(_set_rows, batch_format="pyarrow", zero_copy_batch=True)
        .union(cand.map_batches(_pair_rows("a", False), batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(
            lambda g: _attach(g, "pay_a2"), batch_format="pyarrow"
        )
        # pay_a from round 1 lands in pay_a2; promote it
        .map_batches(
            lambda t: t.drop_columns(["pay_a"]).rename_columns(["a", "b", "pay_a"]),
            batch_format="pyarrow",
        )
    )
    return (
        payload_ds.map_batches(_set_rows, batch_format="pyarrow", zero_copy_batch=True)
        .union(round1.map_batches(_pair_rows("b", True), batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(lambda g: _attach(g, "pay_b"), batch_format="pyarrow")
    )


def _join_verify_jaccard(ds, candidates, threshold: float, k: int):
    """Fully distributed Jaccard verify: shingle sets packed as
    \\x1f-delimited strings (Arrow group/shuffle payloads stay flat — no
    list-of-string columns through the exchange), attached to both pair
    sides via :func:`_attach_pair_payloads`, verified per batch."""

    def shingle_sets(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        sets = ["\x1f".join(sorted(_shingles(t, k))) for t in batch["text"].to_pylist()]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pay": pa.array(sets, pa.string()),
            }
        )

    sets_ds = ds.map_batches(
        shingle_sets, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = _attach_pair_payloads(sets_ds, candidates, pa.string())

    def verify_joined(batch: pa.Table) -> pa.Table:
        def unpack(s):
            return set(s.split("\x1f")) if s else set()

        return _jaccard_rows(
            batch["a"].to_pylist(),
            batch["b"].to_pylist(),
            [unpack(s) for s in batch["pay_a"].to_pylist()],
            [unpack(s) for s in batch["pay_b"].to_pylist()],
            threshold,
        )

    return joined.map_batches(verify_joined, batch_format="pyarrow")


def _scan_verify_jaccard(ds, candidates, threshold: float, k: int):
    """Exact-Jaccard verification of candidate (a, b) pairs.

    Collect the candidate pairs (small — bounded by
    ``_VERIFY_SCAN_MAX_PAIRS``), dedupe them driver-side (the emitters
    skip the global dedup shuffle), ``ray.put`` the sorted candidate
    doc-id array, rescan the corpus keeping only candidate docs'
    shingle sets, broadcast those to the pair-verify map. One extra
    column-pruned corpus scan, zero join shuffles; the broadcast is the
    SMALL side both times. Shared by MinHash LSH (verify="scan") and
    ngram_jaccard_pairs."""
    import ray
    import ray.data as rd

    pairs = _collect_unique_pairs(candidates.select_columns(["a", "b"]))
    want = np.unique(pairs)  # sorted unique candidate doc ids
    ids_ref = ray.put(want)

    def cand_shingles(batch: pa.Table) -> pa.Table:
        w = ray.get(ids_ref)
        ids = batch["doc_id"].to_numpy()
        idxs = np.flatnonzero(_in_sorted(w, ids))
        texts = batch["text"].take(pa.array(idxs)).to_pylist()
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids[idxs].astype(np.int64), pa.int64()),
                "sh_set": pa.array(
                    ["\x1f".join(sorted(_shingles(t, k))) for t in texts],
                    pa.string(),
                ),
            }
        )

    smap: dict[int, set] = {}
    for batch in (
        ds.map_batches(cand_shingles, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=65536, batch_format="pyarrow")
    ):
        for did, s in zip(batch["doc_id"].to_pylist(), batch["sh_set"].to_pylist()):
            smap[did] = set(s.split("\x1f")) if s else set()
    smap_ref = ray.put(smap)

    def verify_scan(batch: pa.Table) -> pa.Table:
        m = ray.get(smap_ref)
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        return _jaccard_rows(a, b, [m[x] for x in a], [m[y] for y in b], threshold)

    pair_ds = rd.from_arrow(
        pa.table({"a": pairs[:, 0], "b": pairs[:, 1]})
    ).repartition(_PAIR_SHARDS)
    return pair_ds.map_batches(verify_scan, batch_format="pyarrow")


# --------------------------------------------------------- MinHash LSH


def minhash_pairs(sf_dir: str, threshold: float = 0.5, k: int = 3):
    """MinHash LSH over the sf_dir documents table (broadcast verify —
    right-sized for the small test tables)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_pairs_ds(ds, threshold=threshold, k=k, verify="scan")


def minhash_pairs_ds(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    k: int = 3,
    verify: str = "auto",
):
    """MinHash(64) + LSH(16 bands × 4 rows) candidates, exact-Jaccard
    verified.

    ``verify="auto"`` (default): driver-bounded ``"scan"`` verification
    below ``_VERIFY_SCAN_MAX_PAIRS`` candidate pairs, fully distributed
    ``"join"`` above — see :func:`_verify_jaccard_pairs`. ``"scan"``
    collects the candidate doc-id set (proportional to candidate
    *pairs*, not corpus), rescans the corpus for just those docs'
    shingle sets and broadcasts them; ``"join"`` attaches shingle sets
    via two hash-partitioned ``Dataset.join``s with no driver-side
    state; ``"broadcast"`` ships ALL docs' shingles (tiny corpora only).

    The input ``ds`` must be deterministic across executions (this
    function executes it more than once); materialize nondeterministic
    inputs (e.g. an unordered ``limit()``) first.
    """
    if id_col != "doc_id" or text_col != "text":
        ds = ds.select_columns([id_col, text_col]).rename_columns(["doc_id", "text"])

    sig_keys = [f"sig{r}" for r in range(_ROWS_PER_BAND)]
    candidates = _emit_pairs_sharded(
        # batch_size bounds the (64 × shingles) permutation matrix to
        # ~tens of MB per task: large batches allocate 100MB+ temporaries
        # whose page faults dominate the kernel on fault-bound hosts
        ds.map_batches(
            lambda b: _minhash_band_rows(b, k, _BANDS, _ROWS_PER_BAND),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=1024,
        ),
        ["band", *sig_keys],
        dedupe=False,  # the verifier dedupes (scan: driver-side for free)
    )
    return _verify_jaccard_pairs(ds, candidates, threshold, k, verify)


def _minhash_band_rows(
    batch: pa.Table, k: int, bands: int, rows_per_band: int
) -> pa.Table:
    """One row per (doc, band) carrying the band's signature chunk as
    compound int64 key columns — bucket membership is exact chunk
    equality inside _emit_pairs_sharded, no re-hashing (and no hash
    collisions adding spurious candidates). Signatures are computed
    whole-batch: vectorized shingle hashing (_shingle_hashes_batch)
    + one (P × shingles) affine pass + per-doc segment minima."""
    d_idx, sh, n = _shingle_hashes_batch(batch["text"], k)
    sigs = np.full((n, _N_PERM), np.uint64(_MERSENNE), np.uint64)
    if sh.size:
        x = sh % np.uint64(_MERSENNE)
        vals = _minhash_vals(x)  # (P, m)
        counts = np.bincount(d_idx, minlength=n)
        nonempty = np.flatnonzero(counts > 0)
        starts = np.concatenate(([0], np.cumsum(counts)))[nonempty]
        sigs[nonempty] = np.minimum.reduceat(vals, starts, axis=1).T
    chunks = sigs[:, : bands * rows_per_band].reshape(n, bands, rows_per_band)
    arrays = {
        "doc_id": pa.array(np.repeat(batch["doc_id"].to_numpy(), bands)),
        "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()),
    }
    for r in range(rows_per_band):
        arrays[f"sig{r}"] = pa.array(
            chunks[:, :, r].reshape(-1).view(np.int64), pa.int64()
        )
    return pa.Table.from_pydict(arrays)


def minhash_pairs_exact(
    sf_dir: str, threshold: float = 0.5, k: int = 3, verify: str = "auto"
):
    """MinHash LSH degenerated to PROVABLE candidate recall 1.0 — the
    value-exact driver twin of :func:`minhash_pairs`.

    The same pipeline stages run — vectorized shingle hashing, 64-perm
    signature kernel, banded row emission, sharded bucket discovery,
    exact-Jaccard verification — but the banding is collapsed to ONE
    band carrying ZERO signature key columns, so every document shares
    the single bucket, the candidate set is all pairs (the per-bucket
    star cap is lifted to 2^31), and recall is exactly 1.0 by
    construction. The verified output therefore equals the all-pairs
    Jaccard ground truth: the ``ngram_jaccard_pairs`` DuckDB oracle is
    this function's oracle too. Candidate volume is O(n²) by
    construction — test/driver scale only; production banding is
    :func:`minhash_pairs_ds`."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n = ds.count()  # parquet metadata, no scan
    if n > _EXACT_TWIN_MAX_DOCS:
        # all pairs of n docs land in ONE group task: a clear error
        # beats a 20 GB triu_indices OOM
        raise ValueError(
            f"minhash_pairs_exact is the O(n²) all-pairs twin for "
            f"driver/test corpora (≤ {_EXACT_TWIN_MAX_DOCS} docs); got "
            f"{n} — use minhash_pairs_ds (production banding) instead"
        )
    candidates = _emit_pairs_sharded(
        ds.map_batches(
            lambda b: _minhash_band_rows(b, k, 1, 0),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=1024,
        ),
        ["band"],
        dedupe=False,
        max_clique=1 << 31,
    )
    return _verify_jaccard_pairs(ds, candidates, threshold, k, verify)


# all-pairs twin cap: C(20k, 2) = 2e8 pairs ≈ 3.2 GB of index arrays in
# the single bucket's group task — the most one worker should ever hold
_EXACT_TWIN_MAX_DOCS = 20_000


# ------------------------------------------------------------- SimHash


def simhash64(text: str) -> int:
    toks = _WORD_RE.findall((text or "").lower())
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    from collections import Counter

    for tok, cnt in Counter(toks).items():
        h = _hash64(tok)
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += (bits.astype(np.int64) * 2 - 1) * cnt
    sig = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            sig |= np.uint64(1) << np.uint64(i)
    return int(sig)


def simhash64_batch(text_col) -> np.ndarray:
    """Whole-batch simhash — bit-identical to ``simhash64`` per row
    (same token hashes, same weighted-majority rule): per-unique-token
    bit matrix × per-(doc, token) counts, accumulated per doc."""
    from ..stages.tokenize import token_codes_batch

    uniq, codes, lens, n = token_codes_batch(text_col, lower_first=True)
    out = np.zeros(n, np.uint64)
    if not len(uniq):
        return out
    th = np.fromiter(
        (_token_hash_cached(t) if t else 0 for t in uniq), np.uint64, len(uniq)
    )
    real = np.fromiter((bool(t) for t in uniq), bool, len(uniq))
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep = real[codes]
    kd, kc = doc_of[keep], codes[keep]
    if kd.size == 0:
        return out
    U = len(uniq)
    ukey, cnt = np.unique(kd * U + kc, return_counts=True)
    ud = ukey // U
    uc = ukey % U
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )  # (U, 64)
    contrib = (bits[uc] * 2 - 1) * cnt[:, None]  # (pairs, 64)
    acc = np.zeros((n, 64), np.int64)
    np.add.at(acc, ud, contrib)
    pos = acc > 0  # (n, 64)
    sig = (pos.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
        axis=1, dtype=np.uint64
    )
    # docs with no tokens keep signature 0 (simhash64's empty-doc rule);
    # all-negative accumulators already produce 0 identically
    return sig


def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """Near-dup pairs at hamming distance <= 3 over 64-bit simhash.
    Blocking: 4×16-bit sub-bands (pigeonhole-complete for hd<=3),
    verified exactly."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sig_rows(batch: pa.Table) -> pa.Table:
        sig = simhash64_batch(batch["text"])  # (n,) u64, == simhash64 per row
        n = sig.size
        ids = batch["doc_id"].to_numpy()
        band = np.tile(np.arange(4, dtype=np.int32), n)
        srep = np.repeat(sig, 4)
        shift = np.tile(np.arange(4, dtype=np.uint64) * np.uint64(16), n)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(np.repeat(ids, 4)),
                "band": pa.array(band, pa.int32()),
                "bucket": pa.array(
                    ((srep >> shift) & np.uint64(0xFFFF)).astype(np.int64)
                ),
                "sig": pa.array(srep.view(np.int64)),  # bit-preserving int64
            }
        )

    _P_SCHEMA = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("hamming", pa.int32())]
    )

    def add_shard(batch: pa.Table) -> pa.Table:
        bb = batch["band"].to_numpy().astype(np.uint64)
        bk = batch["bucket"].to_numpy().astype(np.uint64)
        mix = (bb * np.uint64(0x9E3779B97F4A7C15)) ^ bk
        return batch.append_column(
            "shard", pa.array((mix % np.uint64(_PAIR_SHARDS)).astype(np.int64))
        )

    def emit_shard(group: pa.Table) -> pa.Table:
        """Vectorized exact-bucket discovery inside one coarse shard
        (same rationale as _emit_pairs_sharded — Python touches only
        buckets that collide), keeping each pair's hamming distance."""
        docs = group["doc_id"].to_numpy()
        if docs.size < 2:
            return pa.Table.from_pydict({"a": [], "b": [], "hamming": []}).cast(
                _P_SCHEMA
            )
        band = group["band"].to_numpy()
        bucket = group["bucket"].to_numpy()
        sigs = group["sig"].to_numpy()
        order = np.lexsort((docs, bucket, band))
        docs, band, bucket, sigs = (
            docs[order], band[order], bucket[order], sigs[order]
        )
        new = np.zeros(docs.size, bool)
        new[0] = True
        new[1:] |= band[1:] != band[:-1]
        new[1:] |= bucket[1:] != bucket[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], docs.size)
        big = (ends - starts) >= 2
        out = []
        for s, e in zip(starts[big], ends[big]):
            ids, first = np.unique(docs[s:e], return_index=True)
            if ids.size < 2:
                continue
            sg = sigs[s:e][first]
            ai, bi = _pair_indices(ids.size)
            x = (sg[ai] ^ sg[bi]).view(np.uint64)  # XOR is sign-agnostic
            hd = np.zeros(x.size, dtype=np.int32)
            while x.any():
                hd += (x & np.uint64(1)).astype(np.int32)
                x = x >> np.uint64(1)
            keep = hd <= max_hamming
            out.append((ids[ai][keep], ids[bi][keep], hd[keep]))
        if not out:
            return pa.Table.from_pydict({"a": [], "b": [], "hamming": []}).cast(
                _P_SCHEMA
            )
        return pa.Table.from_pydict(
            {
                "a": np.concatenate([o[0] for o in out]),
                "b": np.concatenate([o[1] for o in out]),
                "hamming": np.concatenate([o[2] for o in out]),
            }
        ).cast(_P_SCHEMA)

    pairs = (
        ds.map_batches(sig_rows, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(emit_shard, batch_format="pyarrow")
    )
    # dedupe pairs found in multiple bands
    from ray.data.aggregate import Min

    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


# ------------------------------------------- duplicate-cluster labels


def dedup_clusters(sf_dir: str, threshold: float = 0.5, k: int = 3, max_iters: int = 25):
    """Connected components over the near-duplicate graph: every doc
    labeled with the MIN doc_id of its duplicate cluster (singletons
    label themselves) — the canonical "keep one per cluster" rule.

    Distributed iterative label propagation (min-label flooding), all
    Ray Data: edges = :func:`ngram_jaccard_pairs` (a, b) made symmetric;
    labels start as (node, node); each round pairs labels with edges via
    a tag-union REDUCE-SIDE join bucketed on ``src % 64`` (the same
    pattern as pipelines/graph.py — Ray 2.49's hash ``Dataset.join``
    mis-resolves key columns when executed repeatedly in a loop, and the
    bounded bucket domain keeps the reduce at ~64 vectorized group calls
    instead of one Python call per node), sends each node's label to its
    neighbors, and takes ``groupby(node).min(label)``. Labels fall
    monotonically; min-flooding needs up to DIAMETER rounds, so a
    duplicate chain longer than ``max_iters`` hops is detected by the
    label-sum fixpoint check and raises rather than returning silently
    unconverged labels. Per round the shuffle moves (node, label) int
    pairs only — never text.
    """
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    edges = (
        ngram_jaccard_pairs(sf_dir, threshold, k)
        .select_columns(["a", "b"])
        .materialize()
    )

    _NB = 64  # reduce-bucket domain for the per-round label join

    def sym(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        src = np.concatenate((a, b))
        return pa.Table.from_pydict(
            {
                "grp": (src % _NB).astype(np.int32),
                "src": src,
                "dst": np.concatenate((b, a)),
                "label": np.zeros(src.size, np.int64),
                "is_label": np.zeros(src.size, np.int8),
            }
        )

    edges_sym = edges.map_batches(sym, batch_format="pyarrow").materialize()
    n_edges = edges_sym.count()

    def init_labels(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        return pa.Table.from_pydict({"node": ids, "label": ids})

    labels = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(init_labels, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    if n_edges == 0:
        return labels.select_columns(["node", "label"]).rename_columns(
            ["doc_id", "cluster"]
        )

    def label_rows(batch: pa.Table) -> pa.Table:
        nd = batch["node"].to_numpy()
        return pa.Table.from_pydict(
            {
                "grp": (nd % _NB).astype(np.int32),
                "src": nd,
                "dst": np.full(nd.size, -1, np.int64),
                "label": batch["label"].to_numpy(),
                "is_label": np.ones(nd.size, np.int8),
            }
        )

    def send_labels(group: pa.Table) -> pa.Table:
        """One bucket: vectorized lookup of each edge's src label."""
        is_label = group["is_label"].to_numpy()
        src = group["src"].to_numpy()
        lidx = np.flatnonzero(is_label == 1)
        eidx = np.flatnonzero(is_label == 0)
        if eidx.size == 0:
            return pa.Table.from_pydict({"node": [], "label": []}).cast(
                pa.schema([("node", pa.int64()), ("label", pa.int64())])
            )
        lnodes = src[lidx]
        lvals = group["label"].to_numpy()[lidx]
        order = np.argsort(lnodes)
        lnodes, lvals = lnodes[order], lvals[order]
        pos = np.searchsorted(lnodes, src[eidx])
        return pa.Table.from_pydict(
            {
                "node": group["dst"].to_numpy()[eidx],
                "label": lvals[pos],
            }
        )

    prev_sum = None
    converged = False
    for _ in range(max_iters):
        tagged = edges_sym.union(
            labels.map_batches(label_rows, batch_format="pyarrow")
        )
        msgs = tagged.groupby("grp").map_groups(send_labels, batch_format="pyarrow")
        labels = (
            labels.union(msgs)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if prev_sum is not None and cur == prev_sum:
            converged = True
            break  # fixpoint: no label changed this round
        prev_sum = cur
    if not converged:
        raise RuntimeError(
            f"dedup_clusters did not reach the label fixpoint within "
            f"{max_iters} rounds (a duplicate chain longer than max_iters "
            f"hops); raise max_iters"
        )

    return labels.select_columns(["node", "label"]).rename_columns(
        ["doc_id", "cluster"]
    )


# --------------------------------------------------- embedding cosine


def _embedding_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, float64 matrix) from an Arrow (vec_id, embedding) batch
    — vectorized list-flatten, no per-row Python."""
    import pyarrow.compute as pc

    ids = batch["vec_id"].to_numpy()
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.float64)
    return ids, flat.reshape(len(ids), -1)


def _cosine_block(
    ids_a, mat_a, ids_b, mat_b, threshold: float, same_chunk: bool
) -> pa.Table:
    na = np.linalg.norm(mat_a, axis=1)
    nb = np.linalg.norm(mat_b, axis=1)
    na[na == 0] = 1.0
    nb[nb == 0] = 1.0
    cos = (mat_a @ mat_b.T) / na[:, None] / nb[None, :]
    ai, bi = np.nonzero(cos >= threshold)
    if same_chunk:
        tri = ai < bi  # each unordered pair once, no self-pairs
        ai, bi = ai[tri], bi[tri]
    a_ids = ids_a[ai]
    b_ids = ids_b[bi]
    # canonical (a < b); cross-chunk pairs appear in exactly one block
    lo = np.minimum(a_ids, b_ids)
    hi = np.maximum(a_ids, b_ids)
    keep = lo != hi
    return pa.Table.from_pydict(
        {
            "a": lo[keep],
            "b": hi[keep],
            "cosine": round_half_up(cos[ai, bi][keep], 6),
        }
    )


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.3):
    """EXACT near-dup pairs by embedding cosine >= threshold.

    All-pairs semantics is inherently Ω(N²) compute — this pipeline
    distributes it as a blocked cross product instead of the round-1
    driver-broadcast design: the embedding table is repartitioned into C
    chunks whose Arrow blocks stay in the OBJECT STORE
    (``to_arrow_refs``); a task per chunk-pair (i ≤ j) pulls two chunks
    and emits its block of the cosine matrix. Driver memory is O(C)
    refs; worker memory is two chunks; every pair is produced exactly
    once (upper-triangle blocks, elementwise-canonical ids). For corpora
    where even C(C+1)/2 block tasks are unaffordable, use
    :func:`embedding_dup_pairs_lsh` — sub-quadratic candidate discovery
    with documented recall.
    """
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n = ds.count()
    chunk_rows = 8192
    n_chunks = max(1, (n + chunk_rows - 1) // chunk_rows)
    refs = ds.repartition(n_chunks).materialize().to_arrow_refs()
    n_chunks = len(refs)

    def block(batch: pa.Table, refs=refs) -> pa.Table:
        import ray as _ray

        out = []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ids_a, mat_a = _embedding_matrix(_ray.get(refs[i]))
            if i == j:
                out.append(
                    _cosine_block(ids_a, mat_a, ids_a, mat_a, threshold, True)
                )
            else:
                ids_b, mat_b = _embedding_matrix(_ray.get(refs[j]))
                out.append(
                    _cosine_block(ids_a, mat_a, ids_b, mat_b, threshold, False)
                )
        return pa.concat_tables(out)

    items = [
        {"i": i, "j": j} for i in range(n_chunks) for j in range(i, n_chunks)
    ]
    return rd.from_items(items).map_batches(
        block, batch_format="pyarrow", batch_size=1
    )


_HP_BANDS = 24
_HP_BITS = 4  # bits per band; P(band match) = (1 - θ/π)^bits


def _hyperplanes(dim: int, n_planes: int, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, n_planes))


def embedding_dup_pairs_lsh(
    sf_dir: str,
    threshold: float = 0.3,
    bands: int = _HP_BANDS,
    bits: int = _HP_BITS,
    verify: str = "auto",
    max_clique: int = _MAX_CLIQUE,
):
    """Near-dup pairs by cosine via random-hyperplane LSH — the scale
    path (sub-quadratic, documented recall).

    sign(vec · H) gives ``bands × bits`` sign bits; each band's bits
    pack into a bucket id; ``groupby(band, bucket)`` emits star-capped
    candidates; exact cosine verifies each candidate. Every emitted
    (pair, cosine) row is exact; recall for a pair at angle θ is
    ``1 - (1 - (1-θ/π)^bits)^bands`` (≈0.96 at cosine 0.3, ≈1.0 above
    0.7 with the defaults — tests/test_pipelines.py measures it against
    the exact pipeline).

    ``verify="auto"`` (default): below ``_VERIFY_SCAN_MAX_PAIRS``
    candidates, the driver-bounded ``"scan"`` (collect candidate pairs,
    broadcast only the CANDIDATE vectors); above it, the fully
    distributed ``"join"`` (vectors attached to both pair sides via
    the bucketed tag-union joins of :func:`_attach_pair_payloads` — no
    driver-side candidate or vector materialization at any volume).
    """
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    dim = len(ds.take(1)[0]["embedding"])
    H = _hyperplanes(dim, bands * bits)  # sized to the caller's banding
    h_ref = ray.put(H)

    def band_rows(batch: pa.Table) -> pa.Table:
        # THE banding rule lives in similarity._band_buckets (shared
        # with lsh_knn so the two can never drift)
        from .similarity import _band_buckets

        ids, mat = _embedding_matrix(batch)
        buckets = _band_buckets(mat, ray.get(h_ref), bands, bits)  # (n, bands)
        return pa.Table.from_pydict(
            {
                "vec_id": np.repeat(ids, bands),
                "band": np.tile(np.arange(bands, dtype=np.int32), len(ids)),
                "bucket": buckets.reshape(-1),
            }
        )

    candidates = _emit_pairs_sharded(
        ds.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda t: t.rename_columns(["doc_id", "band", "bucket"]),
            batch_format="pyarrow",
        ),
        ["band", "bucket"],
        dedupe=False,  # deduped driver-side below, with the id pull
        max_clique=max_clique,
    )

    return _verify_cosine_pairs(ds, candidates, threshold, verify)


def embedding_lsh_exact(sf_dir: str, threshold: float = 0.3, verify: str = "auto"):
    """Hyperplane LSH degenerated to PROVABLE candidate recall 1.0 —
    the value-exact driver twin of :func:`embedding_dup_pairs_lsh`
    (the :func:`minhash_pairs_exact` trick on the cosine side).

    The same pipeline stages run — hyperplane projection, band/bucket
    packing, sharded bucket discovery, exact-cosine verification — but
    with ONE band of ZERO sign bits every vector lands in the single
    bucket 0, the candidate set is all pairs (star cap lifted), and
    recall is exactly 1.0 by construction. The verified output
    therefore equals the blocked-exact all-pairs result: the
    ``embedding_dup_pairs`` DuckDB oracle is this function's oracle
    too. O(n²) by construction — test/driver scale only; production
    banding is :func:`embedding_dup_pairs_lsh`."""
    import ray.data as rd

    n = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).count()  # parquet metadata, no scan
    if n > _EXACT_TWIN_MAX_DOCS:
        raise ValueError(
            f"embedding_lsh_exact is the O(n²) all-pairs twin for "
            f"driver/test corpora (≤ {_EXACT_TWIN_MAX_DOCS} vectors); "
            f"got {n} — use embedding_dup_pairs_lsh (production "
            "banding) instead"
        )
    return embedding_dup_pairs_lsh(
        sf_dir, threshold, bands=1, bits=0, verify=verify, max_clique=1 << 31
    )


_COS_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("cosine", pa.float64())]
)


def _cosine_rows(a, b, va: np.ndarray, vb: np.ndarray, threshold: float) -> pa.Table:
    """Exact cosine for aligned pair sides, thresholded + rounded."""
    if len(a) == 0:
        return pa.Table.from_pydict({"a": [], "b": [], "cosine": []}).cast(
            _COS_SCHEMA
        )
    na = np.linalg.norm(va, axis=1)
    nb = np.linalg.norm(vb, axis=1)
    na[na == 0] = 1.0
    nb[nb == 0] = 1.0
    cos = (va * vb).sum(axis=1) / na / nb
    keep = cos >= threshold
    return pa.Table.from_pydict(
        {
            "a": np.asarray(a, np.int64)[keep],
            "b": np.asarray(b, np.int64)[keep],
            "cosine": round_half_up(cos[keep], 6),
        }
    ).cast(_COS_SCHEMA)


def _verify_cosine_pairs(ds, candidates, threshold: float, verify: str):
    """Dispatch exact-cosine verification of candidate (a, b) pairs —
    the embedding counterpart of :func:`_verify_jaccard_pairs`, same
    ``"auto"`` contract: driver-bounded ``"scan"`` below
    ``_VERIFY_SCAN_MAX_PAIRS`` candidates, fully distributed ``"join"``
    above (tests/test_degenerate.py asserts scan == join)."""
    if verify == "auto":
        candidates = candidates.select_columns(["a", "b"]).materialize()
        verify = (
            "join" if candidates.count() > _VERIFY_SCAN_MAX_PAIRS else "scan"
        )
    if verify == "scan":
        return _scan_verify_cosine(ds, candidates, threshold)
    if verify == "join":
        deduped = candidates.select_columns(["a", "b"]).groupby(["a", "b"]).count()
        return _join_verify_cosine(ds, deduped, threshold)
    raise ValueError(f"unknown verify mode {verify!r}")


def _scan_verify_cosine(ds, candidates, threshold: float):
    """Driver-bounded verify: collect + dedupe the candidate pairs,
    rescan the embedding table keeping only CANDIDATE vectors, broadcast
    those (the small side both times)."""
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    pairs = _collect_unique_pairs(candidates.select_columns(["a", "b"]))
    cand_tab = rd.from_arrow(
        pa.table({"a": pairs[:, 0], "b": pairs[:, 1]})
    ).repartition(_PAIR_SHARDS)
    ids_ref = ray.put(np.unique(pairs))

    def cand_vecs(batch: pa.Table) -> pa.Table:
        want = ray.get(ids_ref)
        ids, mat = _embedding_matrix(batch)
        keep = _in_sorted(want, ids)
        return pa.Table.from_pydict(
            {
                "vec_id": ids[keep],
                "vec": pa.array(list(mat[keep]), pa.list_(pa.float64())),
            }
        )

    vmap: dict[int, np.ndarray] = {}
    for batch in ds.map_batches(
        cand_vecs, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=65536, batch_format="pyarrow"):
        ids = batch["vec_id"].to_numpy()
        if len(ids) == 0:
            continue
        flat = pc.list_flatten(batch["vec"]).to_numpy(zero_copy_only=False)
        m = flat.reshape(len(ids), -1)
        for i, row in zip(ids.tolist(), m):
            vmap[i] = row

    vmap_ref = ray.put(vmap)

    def verify_scan(batch: pa.Table) -> pa.Table:
        m = ray.get(vmap_ref)
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        if not a:
            return _cosine_rows([], [], None, None, threshold)
        return _cosine_rows(
            a,
            b,
            np.stack([m[x] for x in a]),
            np.stack([m[y] for y in b]),
            threshold,
        )

    return cand_tab.map_batches(verify_scan, batch_format="pyarrow")


def _join_verify_cosine(ds, candidates, threshold: float):
    """Fully distributed verify: vectors packed as raw float64 bytes
    (flat binary through the exchange), attached to both pair sides via
    :func:`_attach_pair_payloads`, cosine computed per batch. Nothing
    candidate- or corpus-sized ever reaches the driver.

    A candidate doc_id with no embedding row gets an EMPTY payload from
    the join; such pairs are dropped (can't be verified similar — the
    same effective outcome as the jaccard twin's empty shingle set)
    instead of crashing ``np.stack`` on ragged rows."""

    def vec_rows(batch: pa.Table) -> pa.Table:
        ids, mat = _embedding_matrix(batch)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                "pay": pa.array(
                    [np.ascontiguousarray(r).tobytes() for r in mat], pa.binary()
                ),
            }
        )

    vecs_ds = ds.map_batches(vec_rows, batch_format="pyarrow", zero_copy_batch=True)
    joined = _attach_pair_payloads(vecs_ds, candidates, pa.binary())

    def verify_joined(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # drop pairs with a missing embedding row (empty payload) —
        # np.stack would crash on the ragged zero-length vector
        ok = pc.and_(
            pc.greater(pc.binary_length(batch["pay_a"]), 0),
            pc.greater(pc.binary_length(batch["pay_b"]), 0),
        )
        batch = batch.filter(ok)
        a = batch["a"].to_pylist()
        if not a:
            return _cosine_rows([], [], None, None, threshold)
        b = batch["b"].to_pylist()
        va = np.stack(
            [np.frombuffer(s, np.float64) for s in batch["pay_a"].to_pylist()]
        )
        vb = np.stack(
            [np.frombuffer(s, np.float64) for s in batch["pay_b"].to_pylist()]
        )
        return _cosine_rows(a, b, va, vb, threshold)

    return joined.map_batches(verify_joined, batch_format="pyarrow")


# new-doc keys sort after every seen-doc key (bit 62 set; doc_ids are
# far below 2^62 at any scale we address — asserted per batch)
_INCR_NEW_BIT = 1 << 62


def incremental_dedup(sf_dir: str, held_hex: str = "1999"):
    """Incremental exact dedup: dedup a NEW shard of the corpus against
    an already-ingested SEEN corpus, in one ``groupby`` pass.

    The seen/new split uses THE shared held-out rule
    (``md5(str(doc_id))[:4] <= held_hex`` → seen, the rest → new —
    :func:`..pipelines.sampling.md5_prefix4_le`). A new document is
    kept iff (a) no seen document has the same ``md5(text)`` content
    hash and (b) it is the minimal-doc_id new document for that hash.
    Output ``(doc_id, text_hash)`` of the kept new docs.

    Scale design: same single-aggregate shape as ``curate_corpus`` —
    the keep decision is encoded in the key (seen docs sort below new
    ones via bit 62), so ONE ``aggregate(Min)`` over the content hash
    answers both "hash already ingested?" and "first new copy?", with
    no second shuffle, no join and no per-group Python. The seen side
    never needs to be re-shuffled separately: at 100 TB the seen
    corpus would instead be carried as its (hash → min-key) aggregate
    from the previous run and unioned in — byte-identical semantics,
    since Min is associative over the encoded keys.
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    from .sampling import md5_prefix4_le

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        assert not len(ids) or int(ids.max()) < _INCR_NEW_BIT
        seen = md5_prefix4_le(ids, held_hex)
        key = np.where(seen, ids, ids + _INCR_NEW_BIT)
        return pa.Table.from_arrays(
            [md5_hex_array(batch["text"]), pa.array(key, pa.int64())],
            names=["text_hash", "key"],
        )

    agg = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_hash")
        .aggregate(Min("key", alias_name="key"))
    )

    def keep_new(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kept = batch.filter(pc.greater_equal(batch["key"], _INCR_NEW_BIT))
        doc_id = pc.subtract(kept["key"], _INCR_NEW_BIT)
        return pa.Table.from_arrays(
            [doc_id, kept["text_hash"]], names=["doc_id", "text_hash"]
        )

    return agg.map_batches(keep_new, batch_format="pyarrow")
