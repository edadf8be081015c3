"""Train/test decontamination (n-gram overlap against a held-out set).

The standard large-scale training-data hygiene pass: flag every
training document that shares at least one word k-gram with a
benchmark/eval split, so it can be dropped before training. The shape
that works at 100 TB:

* the benchmark side is SMALL (an eval set) — collect its distinct
  k-gram shingles once and **broadcast** them (``ray.put``, read in
  every task), never shuffle them;
* the training side streams through one ``map_batches`` pass: whole-
  batch vectorized shingle hashing (the same
  :func:`..pipelines.dedup._shingle_hashes_batch` machinery the dedup
  family uses), an ``np.isin`` probe against the broadcast hash set,
  then an exact string-shingle verification of the FEW candidate docs
  (hash hits are verified, so a 64-bit collision can never flag a
  clean document — output is exact by construction);
* zero shuffle, zero driver materialization of the training side.

The held-out split is derived deterministically from the corpus with
the same content-hash rule :func:`..pipelines.sampling.stratified_sample`
uses (``md5(doc_id)[:4] <= threshold_hex``), so the DuckDB oracle can
re-derive both sides and the exact shared-shingle counts in SQL.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .dedup import _shingle_hashes_batch, _shingles


def _is_benchmark(doc_id: int, threshold_hex: str) -> bool:
    return hashlib.md5(str(doc_id).encode()).hexdigest()[:4] <= threshold_hex


def benchmark_shingles(
    sf_dir: str, threshold_hex: str, k: int
) -> tuple[set[str], np.ndarray]:
    """Distinct shingle strings (+ sorted 64-bit hashes) of the held-out
    split. Driver memory is bounded by the benchmark split's size — an
    eval set, small by definition (documented contract; for a large
    split, swap the set for a Bloom filter and keep the verify pass)."""
    import ray.data as rd

    from .dedup import shingle_hash_str

    def bench_rows(batch: pa.Table) -> pa.Table:
        from .sampling import md5_prefix4_le

        keep = md5_prefix4_le(batch["doc_id"].to_pylist(), threshold_hex)
        sub = batch.filter(pa.array(keep))
        shingles = sorted(
            {s for t in sub["text"].to_pylist() for s in _shingles(t, k)}
        )
        return pa.Table.from_pydict({"sh": pa.array(shingles, pa.string())})

    df = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(bench_rows, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    # an all-empty Dataset can surface as a column-less DataFrame (Ray
    # drops the schema) — an empty held-out split is a valid input
    sh_set = set(df["sh"]) if "sh" in df.columns else set()
    hashes = np.sort(
        np.fromiter((shingle_hash_str(s) for s in sh_set), np.uint64, len(sh_set))
    )
    return sh_set, hashes


def shared_shingle_counts(
    text_col, bench_set: set[str], bench_hashes: np.ndarray, k: int
) -> np.ndarray:
    """Per-row count of distinct shingles shared with the benchmark
    set: vectorized hash probe against the sorted broadcast array,
    exact string verification of the FEW candidate rows only (a 64-bit
    collision can never inflate the count). Shared by
    :func:`decontaminate` and the curation pipeline."""
    from .dedup import _in_sorted

    d_idx, sh, n = _shingle_hashes_batch(text_col, k)
    out = np.zeros(n, np.int64)
    if sh.size == 0 or bench_hashes.size == 0:
        return out
    cand = np.unique(d_idx[_in_sorted(bench_hashes, sh)])
    if cand.size == 0:
        return out
    texts = text_col.take(pa.array(cand)).to_pylist()
    for ci, t in zip(cand, texts):
        out[ci] = len(_shingles(t, k) & bench_set)
    return out


def decontaminate(sf_dir: str, threshold_hex: str = "0147", k: int = 3):
    """(doc_id, n_shared) for every TRAINING doc (not in the held-out
    split) sharing ≥1 word ``k``-gram with the split; ``n_shared`` =
    number of its distinct shingles that appear in the split."""
    import ray
    import ray.data as rd

    sh_set, sh_hashes = benchmark_shingles(sf_dir, threshold_hex, k)
    bench_ref = ray.put((sh_set, sh_hashes))

    empty = pa.Table.from_pydict({"doc_id": [], "n_shared": []}).cast(
        pa.schema([("doc_id", pa.int64()), ("n_shared", pa.int64())])
    )

    def flag(batch: pa.Table) -> pa.Table:
        from .sampling import md5_prefix4_le

        bset, bhash = ray.get(bench_ref)
        train = ~md5_prefix4_le(batch["doc_id"].to_pylist(), threshold_hex)
        sub = batch.filter(pa.array(train))
        if sub.num_rows == 0 or bhash.size == 0:
            return empty
        shared = shared_shingle_counts(sub["text"], bset, bhash, k)
        nz = np.flatnonzero(shared)
        if nz.size == 0:
            return empty
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(
                    sub["doc_id"].to_numpy()[nz].astype(np.int64), pa.int64()
                ),
                "n_shared": pa.array(shared[nz], pa.int64()),
            }
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)
