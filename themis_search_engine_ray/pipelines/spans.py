"""Duplicate-span removal: exact-substring deduplication approximated
at k-token-gram granularity (the distributed counterpart of the
suffix-array substring dedup of Lee et al., "Deduplicating Training
Data Makes Language Models Better", 2022).

A *gram* is the space-joined string of ``k`` consecutive tokens of a
document, where tokens are the ``[a-z0-9]+`` runs of ``lower(text)`` —
the SAME shared convention as dedup shingling, chunking, pack_offsets
and mixing token counts. A gram is *duplicated* when its total
occurrence count across the corpus is ≥ 2 (within-doc repeats count).
Every token covered by at least one duplicated-gram occurrence is
masked; the output keeps, per document, the token total, the masked
count, and the text rebuilt from the surviving tokens in order.

Exactness contract: grams are keyed by ``md5(gram)`` on BOTH the
engine side and the SQL-oracle side, so the result is value-exact by
construction even in the (cryptographically negligible) event of a
collision — a collision would mask the same extra tokens on both
sides.

Scale design (100 TB):

- The duplicated-gram set is usually a tiny fraction of the corpus;
  when it fits (``<= broadcast_cap`` grams) it is collected once,
  ``ray.put`` once, and membership-tested per batch with one
  ``searchsorted`` over fixed-width ``S16`` digests — one counting
  shuffle (per-batch ``value_counts`` combiner → ``groupby(gram)``
  Sum) plus one streaming mask pass, no second shuffle.
- Past the cap the pipeline auto-switches to a fully distributed
  two-shuffle path: every gram occurrence ``(gram, doc_id, pos)`` is
  exchanged once by gram (a group with ≥ 2 rows IS the duplicate set —
  the counting aggregate and the probe collapse into one shuffle),
  then hits are bucketed by ``hash(doc_id)`` together with the doc
  payloads (the `_JOIN_BUCKETS`-style tag-union of
  ``pipelines/dedup.py``) and each bucket masks/rebuilds its docs in
  one vectorized pass. Shuffling every gram occurrence is the
  irreducible cost of exact substring dedup at scale (Lee et al.
  shuffle suffixes); both paths are pytest-asserted equal.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SPAN_K = 5
# broadcast the dup-gram set below this many grams (16 B digest each →
# ≤ ~32 MB in the object store); switch to the distributed join above
_BROADCAST_CAP = 2_000_000
# distributed-path reduce buckets target ~1M doc rows per bucket
_ROWS_PER_BUCKET = 1_000_000


def _md5_digests(texts) -> np.ndarray:
    """Raw 16-byte md5 digests of a text sequence (list or Arrow
    string array, hashed straight from the Arrow buffer) as a numpy
    ``S16`` array (memcmp-comparable, searchsorted/unique-ready)."""
    from .dedup import md5_digests

    if not len(texts):
        return np.empty(0, "S16")
    return np.frombuffer(md5_digests(texts), dtype="S16")


def _gram_digests_dedup(grams: pa.Array) -> np.ndarray:
    """Per-gram S16 digests, hashing each DISTINCT gram once:
    duplicated grams are exactly the common ones, so dictionary-
    encoding before the irreducible md5 loop skips the repeats."""
    if not len(grams):
        return np.empty(0, "S16")
    enc = grams.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    uniq = _md5_digests(enc.dictionary)
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return uniq[idx]


def _doc_tokens_batch(batch: pa.Table):
    """Tokenize a batch: flat kept-token strings (Arrow) plus per-doc
    offsets and counts."""
    from ..stages.tokenize import token_codes_batch

    uniq, codes, lens, n = token_codes_batch(batch["text"], lower_first=True)
    doc_of_all = np.repeat(np.arange(n, dtype=np.int64), lens)
    if len(uniq):
        real = np.fromiter((bool(t) for t in uniq), bool, len(uniq))
        keep = real[codes]
    else:
        keep = np.zeros(0, bool)
    doc_of = doc_of_all[keep]
    tok_codes = codes[keep]
    nt = np.bincount(doc_of, minlength=n).astype(np.int64)
    doc_tok_off = np.zeros(n + 1, np.int64)
    np.cumsum(nt, out=doc_tok_off[1:])
    tok_strings = pa.array(uniq, pa.string()).take(pa.array(tok_codes))
    if isinstance(tok_strings, pa.ChunkedArray):
        tok_strings = tok_strings.combine_chunks()
    return tok_strings, doc_tok_off, nt


def _doc_grams_batch(batch: pa.Table, k: int):
    """Tokenize a batch and enumerate every k-gram position.

    Returns ``(tok_strings, doc_tok_off, nt, g_doc, g_pos, grams)``:
    the flat kept-token strings (Arrow) with per-doc offsets
    ``doc_tok_off`` and counts ``nt``; per-gram doc index / 0-based
    token position; and the space-joined gram strings (Arrow). A doc
    with fewer than k tokens contributes no grams."""
    tok_strings, doc_tok_off, nt = _doc_tokens_batch(batch)
    n = len(nt)

    n_grams_per_doc = np.maximum(nt - k + 1, 0)
    total = int(n_grams_per_doc.sum())
    g_doc = np.repeat(np.arange(n, dtype=np.int64), n_grams_per_doc)
    goff = np.zeros(n + 1, np.int64)
    np.cumsum(n_grams_per_doc, out=goff[1:])
    g_pos = np.arange(total, dtype=np.int64) - np.repeat(goff[:-1], n_grams_per_doc)
    # gather the k tokens of every gram and join once
    assert total * k < 2**31, "chunk the batch: int32 list offsets"
    within = np.tile(np.arange(k, dtype=np.int64), total)
    gidx = (doc_tok_off[g_doc] + g_pos).repeat(k) + within
    gram_toks = tok_strings.take(pa.array(gidx))
    if isinstance(gram_toks, pa.ChunkedArray):
        gram_toks = gram_toks.combine_chunks()
    grams = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(np.arange(0, (total + 1) * k, k, dtype=np.int64), pa.int32()),
            gram_toks,
        ),
        " ",
    )
    return tok_strings, doc_tok_off, nt, g_doc, g_pos, grams


def _mask_and_rebuild(
    doc_ids: np.ndarray,
    tok_strings: pa.Array,
    doc_tok_off: np.ndarray,
    nt: np.ndarray,
    hit_doc: np.ndarray,
    hit_pos: np.ndarray,
    k: int,
) -> pa.Table:
    """Cover tokens ``[pos, pos+k)`` of every hit with a diff-array
    (+1/−1 then cumsum), drop covered tokens, rejoin per doc."""
    n = len(nt)
    total_tok = int(doc_tok_off[-1])
    delta = np.zeros(total_tok + 1, np.int64)
    start = doc_tok_off[hit_doc] + hit_pos
    np.add.at(delta, start, 1)
    np.add.at(delta, start + k, -1)  # pos ≤ nt−k ⇒ stays within the doc
    masked = np.cumsum(delta[:-1]) > 0
    n_masked = np.bincount(
        np.repeat(np.arange(n, dtype=np.int64), nt)[masked], minlength=n
    ).astype(np.int64)
    kept = tok_strings.filter(pa.array(~masked))
    if isinstance(kept, pa.ChunkedArray):
        kept = kept.combine_chunks()
    kept_off = np.zeros(n + 1, np.int64)
    np.cumsum(nt - n_masked, out=kept_off[1:])
    text_clean = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(kept_off, pa.int32()), kept), " "
    )
    return pa.Table.from_arrays(
        [
            pa.array(doc_ids, pa.int64()),
            pa.array(nt, pa.int64()),
            pa.array(n_masked, pa.int64()),
            text_clean,
        ],
        names=["doc_id", "n_tokens", "n_masked", "text_clean"],
    )


def _dup_gram_ds(ds, k: int):
    """Dataset of duplicated-gram md5-hex keys: per-batch
    ``value_counts`` combiner → one ``groupby(gram)`` Sum → cnt ≥ 2."""
    from ray.data.aggregate import Sum

    from .dedup import md5_hex_array

    def partial_counts(batch: pa.Table) -> pa.Table:
        *_, grams = _doc_grams_batch(batch, k)
        if len(grams) == 0:
            return pa.Table.from_pydict(
                {"gram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        # count FIRST, hash each distinct gram once (dup grams are
        # exactly the common ones), straight from the Arrow buffer
        vc = pc.value_counts(grams)
        return pa.Table.from_arrays(
            [md5_hex_array(vc.field("values")), pc.cast(vc.field("counts"), pa.int64())],
            names=["gram", "cnt"],
        )

    return (
        ds.map_batches(partial_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gram")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["cnt"], 2)).select(["gram"]),
            batch_format="pyarrow",
        )
    )


def _span_dedup_broadcast(ds, dup_hexes: list, k: int):
    """One streaming mask pass against the ray.put dup-digest array."""
    import ray

    digests = np.frombuffer(bytes.fromhex("".join(dup_hexes)), dtype="S16")
    digests = np.sort(digests)
    ref = ray.put(digests)

    def mask(batch: pa.Table) -> pa.Table:
        dig = ray.get(ref)
        tok_strings, off, nt, g_doc, g_pos, grams = _doc_grams_batch(batch, k)
        q = _gram_digests_dedup(grams)
        if dig.size and q.size:
            i = np.searchsorted(dig, q)
            hit = (i < dig.size) & (dig[np.minimum(i, dig.size - 1)] == q)
        else:
            hit = np.zeros(q.size, bool)
        return _mask_and_rebuild(
            batch["doc_id"].to_numpy(), tok_strings, off, nt,
            g_doc[hit], g_pos[hit], k,
        )

    return ds.map_batches(mask, batch_format="pyarrow", zero_copy_batch=True)


def _span_dedup_join(ds, k: int, n_docs: int):
    """Fully distributed path: exchange every gram occurrence by gram
    (groups with ≥ 2 rows are the duplicate hits — counting and probe
    in ONE shuffle), then bucket hits + doc payloads by hash(doc_id)
    and mask/rebuild each bucket vectorized."""
    from .dedup import md5_hex_array
    from .similarity import _splitmix64

    n_buckets = max(16, n_docs // _ROWS_PER_BUCKET)

    def occurrences(batch: pa.Table) -> pa.Table:
        *_, g_doc, g_pos, grams = _doc_grams_batch(batch, k)
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        enc = grams.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        hexes = md5_hex_array(enc.dictionary).take(enc.indices)
        return pa.Table.from_arrays(
            [
                hexes,
                pa.array(ids[g_doc], pa.int64()),
                pa.array(g_pos, pa.int64()),
            ],
            names=["gram", "doc_id", "pos"],
        )

    def dup_hits(group: pa.Table) -> pa.Table:
        # one group = one gram's occurrences (map_groups contract)
        if len(group) >= 2:
            return group.select(["doc_id", "pos"])
        return group.select(["doc_id", "pos"]).slice(0, 0)

    hits = (
        ds.map_batches(occurrences, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gram")
        .map_groups(dup_hits, batch_format="pyarrow")
    )

    def bucket_of(ids: np.ndarray) -> np.ndarray:
        return (_splitmix64(ids.astype(np.uint64)) % np.uint64(n_buckets)).astype(
            np.int64
        )

    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(bucket_of(ids), pa.int64()),
                batch["doc_id"],
                pa.array(np.full(len(ids), -1, np.int64)),
                batch["text"],
            ],
            names=["bucket", "doc_id", "pos", "text"],
        )

    def tag_hits(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(bucket_of(ids), pa.int64()),
                batch["doc_id"],
                batch["pos"],
                pa.array([None] * len(ids), pa.string()),
            ],
            names=["bucket", "doc_id", "pos", "text"],
        )

    def mask_bucket(group: pa.Table) -> pa.Table:
        is_doc = pc.equal(group["pos"], -1)
        docs = group.filter(is_doc)
        hrows = group.filter(pc.invert(is_doc))
        tok_strings, off, nt = _doc_tokens_batch(docs)
        ids = docs["doc_id"].to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")
        # map hit doc_ids → batch-local doc indices
        hid = hrows["doc_id"].to_numpy().astype(np.int64)
        loc = order[np.searchsorted(ids[order], hid)]
        return _mask_and_rebuild(
            ids, tok_strings, off, nt, loc, hrows["pos"].to_numpy(), k
        )

    tagged_docs = ds.map_batches(
        tag_docs, batch_format="pyarrow", zero_copy_batch=True
    )
    tagged_hits = hits.map_batches(tag_hits, batch_format="pyarrow")
    return (
        tagged_docs.union(tagged_hits)
        .groupby("bucket")
        .map_groups(mask_bucket, batch_format="pyarrow")
    )


def span_dedup(
    sf_dir: str,
    k: int = SPAN_K,
    mode: str = "auto",
    broadcast_cap: int = _BROADCAST_CAP,
):
    """Corpus-wide duplicate-span removal over the documents table:
    ``(doc_id, n_tokens, n_masked, text_clean)`` with every token
    covered by a corpus-duplicated k-gram removed.

    ``mode``: ``"broadcast"`` forces the collected-dup-set path,
    ``"join"`` the fully distributed one, ``"auto"`` (default) picks
    by dup-set size vs ``broadcast_cap``."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    if mode == "join":
        return _span_dedup_join(ds, k, n_docs=ds.count())
    dup_ds = _dup_gram_ds(ds, k).materialize()
    if mode == "auto" and dup_ds.count() > broadcast_cap:
        return _span_dedup_join(ds, k, n_docs=ds.count())
    dup_hexes = [r["gram"] for r in dup_ds.take_all()]
    return _span_dedup_broadcast(ds, dup_hexes, k)
