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


def citation_edges(entries):
    """Graph entries → (src, dst, src64, dst64) edge Dataset; malformed
    and citation-less entries contribute no edges."""

    def edges(batch: pa.Table) -> pa.Table:
        srcs, dsts = [], []
        for i, cits in zip(
            batch["id"].to_pylist(), batch["out_citations"].to_pylist()
        ):
            if not i:
                continue
            for c in cits or []:
                srcs.append(i)
                dsts.append(c)
        return pa.Table.from_arrays(
            [
                pa.array(srcs, pa.string()),
                pa.array(dsts, pa.string()),
                pa.array([id64(s) for s in srcs], pa.int64()),
                pa.array([id64(d) for d in dsts], pa.int64()),
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


def pagerank_citations(path: str, n_iter: int = 20, damping: float = 0.85):
    """End-to-end revival of the reference's abandoned link-analysis
    path: JSONL entries → edges → distributed PageRank. Returns a
    Dataset (node:int64, rank:float64) keyed by :func:`id64`."""
    from ..pipelines.graph import pagerank

    edges = citation_edges(read_graph_entries(path)).map_batches(
        lambda t: t.select(["src64", "dst64"]).rename_columns(["src", "dst"]),
        batch_format="pyarrow",
    )
    return pagerank(edges, damping=damping, n_iter=n_iter)
