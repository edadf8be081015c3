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

from .codec import (
    encode_postings_flat,
    gather_ranges,
    ranges_to_indices,
    skips_to_bytes,
)


def _binary_view(col: pa.ChunkedArray, dtype: str) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy view of a large_binary column as (typed data, per-row
    item offsets). Every blob's byte length must be a multiple of the
    item size (true for our packed u64/f64/u32 fragment columns)."""
    arr = col.combine_chunks()
    n = len(arr)
    item = np.dtype(dtype).itemsize
    if n == 0:
        return np.empty(0, dtype), np.zeros(1, np.int64)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    data_buf = arr.buffers()[2]
    if data_buf is None:
        return np.empty(0, dtype), offs // item
    raw = np.frombuffer(data_buf, np.uint8)
    usable = raw[: (raw.size // item) * item].view(dtype)
    return usable, offs // item

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
    """map_groups callable: encode one gkey group and write its segment.

    Sentinel groups (``gkey < 0``, emitted by FragmentBatcher with
    ``emit_doc_stats=True``) carry packed per-doc stats instead of
    postings; they are written to ``doc_stats/salt=*/`` so one shuffle
    produces both outputs."""

    MANIFEST_COLS = ("file", "gkey", "salt", "kind", "n_terms", "n_postings",
                     "bytes", "n_docs", "sum_dl")

    def __init__(self, seg_dir: str, with_positions: bool = True, ds_dir: str | None = None):
        self.seg_dir = seg_dir
        self.with_positions = with_positions
        self.ds_dir = ds_dir

    def _write_doc_stats(self, group: pa.Table, gkey: int, salt: int) -> pa.Table:
        from .tokenize import unpack_conv_ids

        docs_col = group["docs"].combine_chunks()
        tfs_col = group["tfs"].combine_chunks()
        npos_col = group["npos"].combine_chunks()
        pos_col = group["pos"].combine_chunks()
        extra_col = (
            group["extra"].combine_chunks() if "extra" in group.column_names else None
        )
        term_col = group["term"].combine_chunks()
        ids, dls, turns, convs, texts, roles = [], [], [], [], [], []
        has_text = False
        has_role = False
        for r in range(group.num_rows):
            ids.append(np.frombuffer(docs_col[r].as_buffer(), dtype="<u8"))
            dls.append(np.frombuffer(tfs_col[r].as_buffer(), dtype="<f8"))
            turns.append(np.frombuffer(npos_col[r].as_buffer(), dtype="<u4"))
            convs.extend(unpack_conv_ids(pos_col[r].as_py()))
            role_blob = term_col[r].as_py()  # doc-stat rows tunnel roles here
            if role_blob:
                has_role = True
                roles.extend(role_blob.split("\x1f"))
            if extra_col is not None:
                blob = extra_col[r].as_py()
                if blob:
                    has_text = True
                    texts.extend(unpack_conv_ids(blob))
        doc_id = np.concatenate(ids).astype(np.int64)
        dl = np.concatenate(dls).astype(np.int32)
        turn = np.concatenate(turns).astype(np.int32)
        order = np.argsort(doc_id, kind="stable")
        arrays = [
            pa.array(doc_id[order]),
            pa.array(np.asarray(convs, dtype=object)[order].tolist(), pa.string()),
            pa.array(turn[order]),
            pa.array(dl[order]),
        ]
        names = ["doc_id", "conv_id", "turn_idx", "dl"]
        if has_role:
            arrays.append(
                pa.array(np.asarray(roles, dtype=object)[order].tolist(), pa.string())
            )
            names.append("role")
        if has_text:
            # doc store: the working RESULT_TYPE.FULL equivalent
            arrays.append(
                pa.array(np.asarray(texts, dtype=object)[order].tolist(), pa.string())
            )
            names.append("text")
        tab = pa.Table.from_arrays(arrays, names=names)
        out_dir = os.path.join(self.ds_dir, f"salt={salt}")
        os.makedirs(out_dir, exist_ok=True)
        fname = f"docstats-{salt:04d}.parquet"
        fpath = os.path.join(out_dir, fname)
        tmp = fpath + ".tmp"
        pq.write_table(tab, tmp)
        os.replace(tmp, fpath)
        return pa.Table.from_pydict(
            {
                "file": [f"salt={salt}/{fname}"],
                "gkey": [gkey],
                "salt": [salt],
                "kind": ["doc_stats"],
                "n_terms": [0],
                "n_postings": [0],
                "bytes": [os.path.getsize(fpath)],
                "n_docs": [tab.num_rows],
                "sum_dl": [int(dl.sum())],
            }
        )

    def __call__(self, group: pa.Table) -> pa.Table:
        gkey = int(group["gkey"][0].as_py())
        salt = int(group["salt"][0].as_py())
        if gkey < 0:
            return self._write_doc_stats(group, gkey, salt)
        terms = np.asarray(group["term"].to_pylist(), dtype=object)

        # zero-copy typed views over the packed fragment columns
        doc_data, doc_offs = _binary_view(group["docs"], "<u8")
        tf_data, tf_offs = _binary_view(group["tfs"], "<f8")

        order = np.argsort(terms, kind="stable").astype(np.int64)
        sorted_terms = terms[order]
        # term boundaries among sorted fragment rows
        new_term = np.empty(sorted_terms.size, bool)
        if sorted_terms.size:
            new_term[0] = True
            new_term[1:] = sorted_terms[1:] != sorted_terms[:-1]
        term_starts_row = np.flatnonzero(new_term)

        # one gather of ALL postings in term-sorted row order (slice
        # memcpys — see codec.gather_ranges)
        lens = doc_offs[order + 1] - doc_offs[order]
        all_docs = gather_ranges(doc_data, doc_offs[order], lens)
        all_tfs = gather_ranges(
            tf_data, tf_offs[order], tf_offs[order + 1] - tf_offs[order]
        )
        gid_per_row = np.cumsum(new_term) - 1  # dense term ids, sorted order
        gid_post = np.repeat(gid_per_row, lens)
        # global (term, doc) sort — replaces per-term argsorts
        ord2 = np.lexsort((all_docs, gid_post))
        all_docs = all_docs[ord2]
        all_tfs = all_tfs[ord2]
        term_counts = np.bincount(gid_post, minlength=term_starts_row.size).astype(np.int64)
        post_bounds = np.concatenate(([0], np.cumsum(term_counts)))

        if self.with_positions:
            np_data, np_offs = _binary_view(group["npos"], "<u4")
            p_data, p_offs = _binary_view(group["pos"], "<u4")
            all_np = gather_ranges(
                np_data, np_offs[order], np_offs[order + 1] - np_offs[order]
            ).astype(np.int64)
            all_pos = gather_ranges(
                p_data, p_offs[order], p_offs[order + 1] - p_offs[order]
            )
            pstart = np.concatenate(([0], np.cumsum(all_np)[:-1]))
            final_counts = all_np[ord2]
            # per-posting ranges are 1-5 elements — the vectorized index
            # gather wins there (gather_ranges' loop would be per-posting)
            final_pos = all_pos[ranges_to_indices(pstart[ord2], final_counts)]
            fp_bounds = np.concatenate(([0], np.cumsum(final_counts)))

        out_terms, out_df, out_maxtf = [], [], []
        out_docs, out_tfs, out_pos, out_skips = [], [], [], []
        n_postings = 0
        for gi in range(term_starts_row.size):
            lo, hi = int(post_bounds[gi]), int(post_bounds[gi + 1])
            if self.with_positions:
                enc = encode_postings_flat(
                    all_docs[lo:hi],
                    all_tfs[lo:hi],
                    final_counts[lo:hi],
                    final_pos[fp_bounds[lo] : fp_bounds[hi]],
                )
            else:
                enc = encode_postings_flat(all_docs[lo:hi], all_tfs[lo:hi], None, None)
            out_terms.append(str(sorted_terms[term_starts_row[gi]]))
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
                "kind": ["segment"],
                "n_terms": [len(out_terms)],
                "n_postings": [n_postings],
                "bytes": [size],
                "n_docs": [0],
                "sum_dl": [0],
            }
        )
