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

That is ``mode="set"`` — driver memory is bounded by the held-out
split's distinct shingles (fine for eval sets, the documented
contract). ``mode="bloom"`` is the scale path for a benchmark-SUITE-
sized split (GBs of shingles): the driver holds only a fixed-size
Bloom BITMAP (built distributedly, OR-folded streaming), candidate
(doc, shingle) pairs that survive the Bloom probe are exact-matched
against the benchmark shingle STRINGS in a bucketed distributed join —
so Bloom false positives and 64-bit hash collisions are both
eliminated and the output is IDENTICAL to mode="set" (pytest asserts
equality; the driver gate runs the bloom path against the same SQL
oracle). Nothing shingle-set-sized ever materializes anywhere.

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


# ------------------------------------------------------ Bloom scale path

_BLOOM_BITS = 1 << 23  # 8.4M bits = 1 MiB bitmap (~1% FP at ~580k shingles)
_BLOOM_HASHES = 4


def _bloom_positions(h: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(n_hashes, len(h)) bit positions for 64-bit shingle hashes via
    double hashing: ``pos_i = (h + i·(h>>33 | 1)) mod n_bits`` — pure
    vectorized row math, no extra hash passes."""
    h = h.astype(np.uint64)
    step = (h >> np.uint64(33)) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return ((h[None, :] + i * step[None, :]) % np.uint64(n_bits)).astype(
            np.int64
        )


def _bloom_set(words: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(
        words,
        pos >> 6,
        np.left_shift(np.uint64(1), (pos & 63).astype(np.uint64)),
    )


def _bloom_probe(words: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """AND over the n_hashes rows of ``pos``: True = possibly present."""
    bits = (words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
    return bits.all(axis=0)


def benchmark_bloom(
    sf_dir: str,
    threshold_hex: str,
    k: int,
    n_bits: int = _BLOOM_BITS,
    n_hashes: int = _BLOOM_HASHES,
) -> np.ndarray:
    """Bloom bitmap (uint64 words) over the held-out split's shingle
    hashes, built DISTRIBUTEDLY: each batch task emits one row holding
    its partial bitmap; the driver OR-folds those rows streaming, so
    driver memory is ONE bitmap (+ one partial in flight) — never the
    shingle set, whatever the split size. Size ``n_bits`` ≈ 10 bits
    per expected distinct shingle for ~1% FP at 4 hashes; false
    positives only cost verify work, never correctness (the match pass
    is exact on strings)."""
    import ray.data as rd

    assert n_bits % 64 == 0

    def partial(batch: pa.Table) -> pa.Table:
        from .sampling import md5_prefix4_le

        keep = md5_prefix4_le(batch["doc_id"].to_pylist(), threshold_hex)
        sub = batch.filter(pa.array(keep))
        words = np.zeros(n_bits // 64, np.uint64)
        if sub.num_rows:
            _, sh, _ = _shingle_hashes_batch(sub["text"], k)
            if sh.size:
                _bloom_set(words, _bloom_positions(sh, n_bits, n_hashes))
        return pa.Table.from_pydict({"bm": pa.array([words.tobytes()], pa.binary())})

    acc = np.zeros(n_bits // 64, np.uint64)
    rows = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    for b in rows.iter_batches(batch_size=16, batch_format="pyarrow"):
        for buf in b["bm"].to_pylist():
            acc |= np.frombuffer(buf, np.uint64)
    return acc


def _decontaminate_bloom(
    sf_dir: str, threshold_hex: str, k: int, n_bits: int, n_hashes: int
):
    """The mode="bloom" flow: Bloom-probe the training stream, then
    exact-match surviving (doc, shingle) pairs against the benchmark
    shingle STRINGS in a bucketed distributed join (the tag-union
    reduce-side pattern) — output identical to mode="set"."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .dedup import _join_bucket_count, shingle_hash_str

    bloom_ref = ray.put(benchmark_bloom(sf_dir, threshold_hex, k, n_bits, n_hashes))

    _ROW_SCHEMA = pa.schema(
        [
            ("bucket", pa.int64()),
            ("sh", pa.string()),
            ("doc_id", pa.int64()),
            ("tag", pa.int8()),
        ]
    )
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    # benchmark side: shingle STRINGS (per-batch distinct; the bucket
    # group dedups across batches via its set). One scan: rows carry
    # the raw 64-bit hash; the bucket is derived AFTER the materialized
    # count has sized the reduce space (no second shingling pass).
    def bench_hash_rows(batch: pa.Table) -> pa.Table:
        from .sampling import md5_prefix4_le

        keep = md5_prefix4_le(batch["doc_id"].to_pylist(), threshold_hex)
        sub = batch.filter(pa.array(keep))
        shingles = sorted(
            {s for t in sub["text"].to_pylist() for s in _shingles(t, k)}
        )
        n = len(shingles)
        h = np.fromiter(
            (shingle_hash_str(s) for s in shingles), np.uint64, n
        )
        return pa.Table.from_pydict(
            {
                # two's-complement view: round-trips exactly to uint64
                "h": h.astype(np.int64),
                "sh": pa.array(shingles, pa.string()),
            }
        )

    # training side: Bloom-probe every shingle hash vectorized; only
    # docs with ≥1 possible hit are re-shingled, and only their
    # POSSIBLY-matching shingles (superset of true matches, FP-bounded)
    # travel to the match join.
    def cand_rows(n_buckets: int):
        def fn(batch: pa.Table) -> pa.Table:
            from .sampling import md5_prefix4_le

            words = ray.get(bloom_ref)
            train = ~md5_prefix4_le(batch["doc_id"].to_pylist(), threshold_hex)
            sub = batch.filter(pa.array(train))
            out_doc: list[int] = []
            out_sh: list[str] = []
            out_bk: list[int] = []
            if sub.num_rows:
                d_idx, sh, _ = _shingle_hashes_batch(sub["text"], k)
                if sh.size:
                    hit = _bloom_probe(
                        words, _bloom_positions(sh, n_bits, n_hashes)
                    )
                    cand = np.unique(d_idx[hit])
                    if cand.size:
                        dids = sub["doc_id"].to_numpy()
                        texts = sub["text"].take(pa.array(cand)).to_pylist()
                        for ci, t in zip(cand, texts):
                            shs = sorted(_shingles(t, k))
                            hs = np.fromiter(
                                (shingle_hash_str(s) for s in shs),
                                np.uint64,
                                len(shs),
                            )
                            kp = _bloom_probe(
                                words, _bloom_positions(hs, n_bits, n_hashes)
                            )
                            for s, h_, ok in zip(shs, hs, kp):
                                if ok:
                                    out_doc.append(int(dids[ci]))
                                    out_sh.append(s)
                                    # int() first: np.uint64 % python
                                    # int promotes to float64 and
                                    # corrupts 64-bit hashes
                                    out_bk.append(int(h_) % n_buckets)
            return pa.Table.from_pydict(
                {
                    "bucket": pa.array(out_bk, pa.int64()),
                    "sh": pa.array(out_sh, pa.string()),
                    "doc_id": pa.array(out_doc, pa.int64()),
                    "tag": pa.array([1] * len(out_doc), pa.int8()),
                }
            ).cast(_ROW_SCHEMA)

        return fn

    hashed = docs.map_batches(
        bench_hash_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_buckets = _join_bucket_count(hashed.count())

    def to_bench_rows(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_numpy().astype(np.uint64)
        n = len(h)
        return pa.Table.from_pydict(
            {
                "bucket": (h % np.uint64(n_buckets)).astype(np.int64),
                "sh": batch["sh"],
                "doc_id": np.zeros(n, np.int64),
                "tag": np.zeros(n, np.int8),
            }
        ).cast(_ROW_SCHEMA)

    bench_ds = hashed.map_batches(
        to_bench_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    _OUT = pa.schema([("doc_id", pa.int64()), ("n", pa.int64())])

    def match(group: pa.Table) -> pa.Table:
        tags = group["tag"].to_numpy()
        sh = group["sh"].to_pylist()
        bench = {s for s, t in zip(sh, tags) if t == 0}
        keep = [
            i for i in np.flatnonzero(tags == 1) if sh[i] in bench
        ]
        n = len(keep)
        return pa.Table.from_pydict(
            {
                "doc_id": group["doc_id"].take(pa.array(keep, pa.int64())),
                "n": pa.array([1] * n, pa.int64()),
            }
        ).cast(_OUT)

    matched = (
        bench_ds.union(
            docs.map_batches(
                cand_rows(n_buckets), batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby("bucket")
        .map_groups(match, batch_format="pyarrow")
    )
    # (doc, shingle) pairs are distinct by construction (per-doc sorted
    # sets, docs unique), so the Sum of 1s IS the distinct shared count
    return matched.groupby("doc_id").aggregate(Sum("n", alias_name="n_shared"))


def decontaminate(
    sf_dir: str,
    threshold_hex: str = "0147",
    k: int = 3,
    mode: str = "set",
    n_bits: int = _BLOOM_BITS,
):
    """(doc_id, n_shared) for every TRAINING doc (not in the held-out
    split) sharing ≥1 word ``k``-gram with the split; ``n_shared`` =
    number of its distinct shingles that appear in the split.

    ``mode="set"`` broadcasts the split's exact shingle set (driver
    memory = split size — the eval-set contract); ``mode="bloom"`` is
    the benchmark-suite scale path (driver memory = a fixed Bloom
    bitmap, exact distributed string match — identical output, see the
    module docstring)."""
    import ray
    import ray.data as rd

    if mode == "bloom":
        return _decontaminate_bloom(sf_dir, threshold_hex, k, n_bits, _BLOOM_HASHES)
    if mode != "set":
        raise ValueError(f"unknown mode {mode!r} (want 'set' or 'bloom')")

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
