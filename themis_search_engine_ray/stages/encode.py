"""Shuffle-side encode stage: fragment groups -> compressed segment files.

One call handles one ``gkey`` group = (salt doc-range bucket ×
term-hash partition) of one build partition: all partial fragments for
those terms. It concatenates each term's binary-packed runs, sorts by
doc_id, delta+varint encodes into blocked skip-list blobs
(:mod:`.codec`), and writes ONE segment parquet file atomically
(tmp + rename → idempotent under Ray task retries). Returns a one-row
manifest/metrics table.

This replaces the reference's k-way partial-index merge
(``themis/indexer/Indexer.java:776-902`` ``fastmerge``): Ray Data's
groupby shuffle is the merge; the salt in the group key is the skew
control.

Segment file schema: term, salt, df, max_tf, docs, tfs, pos, skips
(binary blobs per codec). Written with ``compression="NONE"`` so query
actors can memory-map them zero-copy.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .codec import encode_postings, skips_to_bytes

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("df", pa.int64()),
        ("max_tf", pa.float64()),
        ("docs", pa.large_binary()),
        ("tfs", pa.large_binary()),
        ("pos", pa.large_binary()),
        ("skips", pa.large_binary()),
    ]
)


class SegmentWriter:
    """map_groups callable: encode one gkey group and write its segment."""

    def __init__(self, seg_dir: str, with_positions: bool = True):
        self.seg_dir = seg_dir
        self.with_positions = with_positions

    def __call__(self, group: pa.Table) -> pa.Table:
        gkey = int(group["gkey"][0].as_py())
        salt = int(group["salt"][0].as_py())
        terms = np.asarray(group["term"].to_pylist(), dtype=object)
        docs_col = group["docs"].combine_chunks()
        tfs_col = group["tfs"].combine_chunks()
        npos_col = group["npos"].combine_chunks()
        pos_col = group["pos"].combine_chunks()

        order = np.argsort(terms, kind="stable")
        sorted_terms = terms[order]
        # term boundaries among sorted fragment rows
        bounds = np.flatnonzero(sorted_terms[1:] != sorted_terms[:-1]) + 1
        starts = np.concatenate(([0], bounds)).astype(np.int64)
        ends = np.concatenate((bounds, [sorted_terms.size])).astype(np.int64)

        out_terms, out_df, out_maxtf = [], [], []
        out_docs, out_tfs, out_pos, out_skips = [], [], [], []
        n_postings = 0
        for lo, hi in zip(starts, ends):
            rows = order[lo:hi]
            dids = np.concatenate(
                [np.frombuffer(docs_col[int(r)].as_buffer(), dtype="<u8") for r in rows]
            )
            tfs = np.concatenate(
                [np.frombuffer(tfs_col[int(r)].as_buffer(), dtype="<f8") for r in rows]
            )
            if self.with_positions:
                plists = []
                for r in rows:
                    npos = np.frombuffer(npos_col[int(r)].as_buffer(), dtype="<u4")
                    flat = np.frombuffer(pos_col[int(r)].as_buffer(), dtype="<u4")
                    offs = np.concatenate(([0], np.cumsum(npos.astype(np.int64))))
                    plists.extend(flat[offs[i] : offs[i + 1]] for i in range(npos.size))
            so = np.argsort(dids, kind="stable")
            dids = dids[so]
            tfs = tfs[so]
            enc = encode_postings(
                dids,
                tfs,
                [plists[i] for i in so] if self.with_positions else None,
            )
            out_terms.append(str(sorted_terms[lo]))
            out_df.append(enc.df)
            out_maxtf.append(enc.max_tf)
            out_docs.append(enc.doc_blob)
            out_tfs.append(enc.tf_blob)
            out_pos.append(enc.pos_blob)
            out_skips.append(skips_to_bytes(enc.skips))
            n_postings += enc.df

        seg = pa.Table.from_arrays(
            [
                pa.array(out_terms, pa.string()),
                pa.array([salt] * len(out_terms), pa.int32()),
                pa.array(out_df, pa.int64()),
                pa.array(out_maxtf, pa.float64()),
                pa.array(out_docs, pa.large_binary()),
                pa.array(out_tfs, pa.large_binary()),
                pa.array(out_pos, pa.large_binary()),
                pa.array(out_skips, pa.large_binary()),
            ],
            schema=SEGMENT_SCHEMA,
        )
        os.makedirs(self.seg_dir, exist_ok=True)
        fname = f"seg-{gkey:08d}.parquet"
        fpath = os.path.join(self.seg_dir, fname)
        tmp = fpath + ".tmp"
        pq.write_table(seg, tmp, compression="NONE")
        os.replace(tmp, fpath)  # atomic; retries overwrite identically
        size = os.path.getsize(fpath)
        return pa.Table.from_pydict(
            {
                "file": [fname],
                "gkey": [gkey],
                "salt": [salt],
                "n_terms": [len(out_terms)],
                "n_postings": [n_postings],
                "bytes": [size],
            }
        )
