"""Citation-graph sources: S4 graph-entry parser + S12 graph storage.

The reference parses SemanticScholar JSON lines into graph entries
(id, authorIds, outCitations) for link analysis
(S2JsonEntryReader.java:162-209) and round-trips the built citation
graph through Java object serialization (Serialization.java:41-80).
This module is the Ray-Data-native equivalent feeding the WORKING
PageRank in :mod:`..pipelines.graph`:

* :func:`read_graph_entries` — streaming JSONL → typed Dataset, with
  the reference's exact semantics: missing ``authors``/``outCitations``
  arrays default to empty lists; the reference's author loop flattens
  every author's id strings straight into one list (its per-author
  ``ids`` list is built and discarded — S2JsonEntryReader.java:177-190),
  replicated here; an unparseable line yields an EMPTY entry (the
  reference logs and returns the blank object) — counted, not silent.
* :func:`citation_edges` — entries → (src, dst) string-id edges, plus
  the deterministic 64-bit id mapping PageRank's int64 shuffle keys
  need (ids are 40-hex SHA1 strings; the top 16 hex chars, two's
  complement, are collision-safe far beyond 10^12 docs).
* :func:`save_graph` / :func:`load_graph` — S12 as it should look at
  100 TB: partitioned Parquet nodes+edges instead of one Java object
  blob; round-trip identity is tested, and a loaded graph feeds
  :func:`..pipelines.graph.pagerank` directly.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

ENTRY_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("author_ids", pa.list_(pa.string())),
        ("out_citations", pa.list_(pa.string())),
        ("malformed", pa.int8()),  # 1 = unparseable line (empty entry)
    ]
)

EDGE_SCHEMA = pa.schema(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("src64", pa.int64()),
        ("dst64", pa.int64()),
    ]
)


def _parse_entry(line: str):
    """Reference-semantics parse of one JSON line (readGraphEntry).

    The reference blanks the entry on ANY parse exception — including
    wrong-typed fields, where Java's ``getJSONArray``/``getJSONObject``
    throw (S2JsonEntryReader.java:162-209) — so type violations here
    (``authors`` a string, an author item not an object, ``ids`` /
    ``outCitations`` not arrays) are counted as malformed rather than
    crashing the task or silently iterating a string char-by-char."""
    try:
        obj = json.loads(line)
        if not isinstance(obj, dict):
            raise ValueError("not an object")
        authors: list[str] = []
        raw_authors = obj.get("authors")
        if raw_authors is not None and not isinstance(raw_authors, list):
            raise ValueError("authors not an array")
        for author in raw_authors or []:
            if author is None:
                continue
            if not isinstance(author, dict):
                raise ValueError("author not an object")
            ids = author.get("ids")
            if ids is not None and not isinstance(ids, list):
                raise ValueError("author ids not an array")
            # the reference flattens each author's id strings directly
            # into the single entry-level list (inner list is dead code)
            for aid in ids or []:
                authors.append(str(aid))
        raw_cits = obj.get("outCitations")
        if raw_cits is not None and not isinstance(raw_cits, list):
            raise ValueError("outCitations not an array")
        citations = [str(c) for c in raw_cits or []]
        doc_id = obj.get("id")
        if doc_id is not None and not isinstance(doc_id, (str, int)):
            raise ValueError("id not a scalar")
        return str(doc_id or ""), authors, citations, 0
    except ValueError:
        return "", [], [], 1  # logged-and-blank in the reference


def read_graph_entries(path: str):
    """Stream a JSONL file/dir into the typed graph-entry Dataset."""
    import ray.data as rd

    def parse_batch(batch: pa.Table) -> pa.Table:
        ids, auth, cits, bad = [], [], [], []
        for line in batch["text"].to_pylist():
            i, a, c, m = _parse_entry(line or "")
            ids.append(i)
            auth.append(a)
            cits.append(c)
            bad.append(m)
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.string()),
                pa.array(auth, pa.list_(pa.string())),
                pa.array(cits, pa.list_(pa.string())),
                pa.array(bad, pa.int8()),
            ],
            schema=ENTRY_SCHEMA,
        )

    return rd.read_text(path).map_batches(
        parse_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def id64(sha1_hex: str) -> int:
    """Deterministic int64 key for a 40-hex S2 id (top 16 hex chars,
    two's complement); non-hex ids fall back to a stable string hash."""
    try:
        v = int(sha1_hex[:16], 16)
    except ValueError:
        import hashlib

        v = int.from_bytes(
            hashlib.blake2b(sha1_hex.encode(), digest_size=8).digest(), "big"
        )
    return int(np.uint64(v).astype(np.int64))


def corpus_id64s(entries) -> np.ndarray:
    """Sorted unique :func:`id64` keys of every (non-malformed) entry —
    the corpus node set the J4 semi-join filters against. Collected to
    the driver in bounded batches (8 bytes/doc: fine to ~10^9 nodes; a
    larger corpus would swap the broadcast for the bucketed tag-union
    semi-join in pipelines/graph.py)."""
    acc: list[np.ndarray] = []
    for batch in (
        entries.select_columns(["id"])
        .iter_batches(batch_size=65536, batch_format="pyarrow")
    ):
        ids = [i for i in batch["id"].to_pylist() if i]
        if ids:
            acc.append(np.asarray([id64(i) for i in ids], np.int64))
    if not acc:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(acc))


def citation_edges(entries, corpus_ids: "np.ndarray | None" = None):
    """Graph entries → (src, dst, src64, dst64) edge Dataset; malformed
    and citation-less entries contribute no edges.

    ``corpus_ids`` (sorted int64 array, e.g. :func:`corpus_id64s`):
    keep only citations whose TARGET exists in the corpus — the
    reference's J4 semi-join (``themis/linkAnalysis/PageRank.java:98-105``
    skips out-citations absent from its document map). Broadcast once
    via ``ray.put``, probed per batch with the sorted-array
    ``_in_sorted`` idiom."""
    ids_ref = None
    if corpus_ids is not None:
        import ray

        ids_ref = ray.put(np.asarray(corpus_ids, np.int64))

    def edges(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids_col = batch["id"]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        cits_col = batch["out_citations"]
        if isinstance(cits_col, pa.ChunkedArray):
            cits_col = cits_col.combine_chunks()
        # vectorized flatten: src index repeats per citation, dst is the
        # flat citation list — no per-row Python over the (possibly
        # long) citation lists
        lens = (
            pc.list_value_length(cits_col)
            .fill_null(0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        src_ids = ids_col.to_pylist()
        valid = np.fromiter((bool(i) for i in src_ids), bool, len(src_ids))
        src_idx = np.repeat(np.arange(len(src_ids)), lens)
        row_ok = valid[src_idx]  # drop citations of blank/malformed rows
        src_idx = src_idx[row_ok]
        dsts = pc.list_flatten(cits_col).filter(pa.array(row_ok))
        src_str = pc.take(ids_col, pa.array(src_idx))
        # id64 per UNIQUE string (hex-prefix parse), then map
        src_list = src_str.to_pylist()
        dst_list = dsts.to_pylist()
        id_cache = {s: id64(s) for s in set(src_list) | set(dst_list)}
        src64 = np.fromiter(
            (id_cache[s] for s in src_list), np.int64, len(src_idx)
        )
        dst64 = np.fromiter(
            (id_cache[s] for s in dst_list), np.int64, len(dst_list)
        )
        if ids_ref is not None:
            import ray

            from ..pipelines.dedup import _in_sorted

            keep = _in_sorted(ray.get(ids_ref), dst64)
            kmask = pa.array(keep)
            src_str = src_str.filter(kmask)
            dsts = dsts.filter(kmask)
            src64, dst64 = src64[keep], dst64[keep]
        return pa.Table.from_arrays(
            [
                src_str,
                dsts,
                pa.array(src64, pa.int64()),
                pa.array(dst64, pa.int64()),
            ],
            schema=EDGE_SCHEMA,
        )

    return entries.map_batches(edges, batch_format="pyarrow", zero_copy_batch=True)


def save_graph(edges, out_dir: str) -> dict:
    """S12 serialize: edges → partitioned Parquet + a json manifest with
    the counts a resuming/validating reader needs."""
    import os

    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    edges.write_parquet(f"{out_dir}/edges")
    n_edges = rd.read_parquet(f"{out_dir}/edges").count()
    manifest = {"format": "citation-graph-parquet-v1", "n_edges": int(n_edges)}
    tmp = f"{out_dir}/manifest.json.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, f"{out_dir}/manifest.json")
    return manifest


def load_graph(out_dir: str):
    """S12 deserialize: manifest-validated Parquet edges Dataset."""
    import ray.data as rd

    with open(f"{out_dir}/manifest.json") as f:
        manifest = json.load(f)
    if manifest.get("format") != "citation-graph-parquet-v1":
        raise ValueError(f"unknown graph format: {manifest.get('format')!r}")
    return rd.read_parquet(f"{out_dir}/edges")


def pagerank_citations(
    path: str,
    n_iter: int = 20,
    damping: float = 0.85,
    corpus_only: bool = False,
):
    """End-to-end revival of the reference's abandoned link-analysis
    path: JSONL entries → edges → distributed PageRank. Returns a
    Dataset (node:int64, rank:float64) keyed by :func:`id64`.

    ``corpus_only=True`` applies the reference's J4 semi-join
    (``PageRank.java:98-105``): citations whose target is not itself a
    corpus entry are dropped, so phantom nodes never enter the graph.
    ``False`` preserves the round-3 rank-everything behavior."""
    from ..pipelines.graph import pagerank

    entries = read_graph_entries(path)
    corpus = None
    if corpus_only:
        entries = entries.materialize()  # consumed twice below
        corpus = corpus_id64s(entries)
    edges = citation_edges(entries, corpus_ids=corpus).map_batches(
        lambda t: t.select(["src64", "dst64"]).rename_columns(["src", "dst"]),
        batch_format="pyarrow",
    )
    return pagerank(edges, damping=damping, n_iter=n_iter)


def synthesize_citations_jsonl(sf_dir: str, out_path: "str | None" = None) -> str:
    """Deterministic synthetic citation corpus over the sf documents
    table (driver/test fixture — no external data): each doc_id becomes
    one JSONL entry with id ``f"{doc_id:016x}"`` (so :func:`id64` maps
    it back to exactly ``doc_id``) citing ``doc_id + 1`` and
    ``doc_id * 3`` — a mix of real and PHANTOM targets, so the J4
    corpus semi-join has work to do — plus one trailing malformed line
    exercising the reference's blank-entry parse rule
    (S2JsonEntryReader.java:162-209). Written atomically, cached by
    content-defining key (the documents path), returned as the path.

    Fixture generator: reads only the doc_id column, driver-side, at
    test scale — not a pipeline stage."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    doc_path = f"{sf_dir}/documents.parquet"
    if out_path is None:
        # cache key includes the source's size + row count so a
        # regenerated documents table never serves a stale graph
        st = os.stat(doc_path)
        n_rows = pq.ParquetFile(doc_path).metadata.num_rows
        key = hashlib.md5(
            f"{doc_path}:{st.st_size}:{n_rows}".encode()
        ).hexdigest()[:12]
        out_path = f"/tmp/themis_citations_{key}/citations.jsonl"
    if os.path.isfile(out_path):
        return out_path
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    ids = sorted(
        int(i)
        for i in pq.read_table(doc_path, columns=["doc_id"])["doc_id"].to_pylist()
    )
    lines = []
    for d in ids:
        cits = [f"{d + 1:016x}", f"{d * 3:016x}"]
        lines.append(
            json.dumps(
                {"id": f"{d:016x}", "authors": [], "outCitations": cits},
                sort_keys=True,
            )
        )
    lines.append("{this is not json")  # blank-entry path
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, out_path)
    return out_path
