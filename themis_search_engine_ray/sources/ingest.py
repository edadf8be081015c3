"""Transcript ingestion from non-Parquet sources (S1-S2 widening).

The index build consumes row-group-chunked Parquet (the format its
read planner parallelizes over). Corpora arriving as JSONL or CSV are
normalized ONCE into partitioned Parquet by this module — the standard
100 TB shape: a streaming Ray Data pass (read → schema-normalize →
``write_parquet`` with bounded row groups), after which every build is
columnar, column-pruned and resumable. No driver-side materialization;
malformed rows are dropped with a counted, not silent, policy.

Normalized schema: (conv_id: string, turn_idx: int32, text: string
[, role: string]) — extra columns pass through untouched.
"""

from __future__ import annotations

import os

import pyarrow as pa

REQUIRED = ("conv_id", "turn_idx", "text")


def _count_input_rows(src_path: str, fmt: str, ds) -> int:
    """Exact input-row count WITHOUT driver-side state or side-channel
    actors — retry-safe by construction (a recomputed count is a pure
    function of the source):

    * parquet — ``Dataset.count()`` on a fresh read is metadata-only
      (row-group counts), no scan;
    * json (JSONL) — one ``read_text().count()`` pass: line counting,
      no JSON parse (Ray's reader drops empty lines, as the JSON reader
      effectively does; a whitespace-only line the JSON parser tolerates
      would over-count by one — acceptable for a drop METRIC, vs the
      retry double-count this replaced);
    * csv — one extra parse pass (``count()`` over a fresh read):
      RFC-4180 quoted newlines make raw line counting wrong, so the
      exact count costs a re-parse. Prefer JSONL/Parquet sources at
      scale, or pass ``count_input=False`` to skip the metric.

    The previous design counted inside the normalize pass via a counter
    actor; Ray task retries/re-execution could double-count there, and
    the per-batch actor round-trip sat on the ingest hot path."""
    import ray.data as rd

    if fmt == "parquet":
        return rd.read_parquet(src_path).count()
    if fmt == "json":
        return rd.read_text(src_path).count()
    return ds.count()


def _normalize(batch: pa.Table) -> pa.Table:
    """Cast the required columns to the canonical types, dropping rows
    with null conv_id/turn_idx (counted by the caller via row deltas)."""
    import pyarrow.compute as pc

    for c in REQUIRED:
        if c not in batch.column_names:
            raise ValueError(f"transcript source is missing column {c!r}")
    keep = pc.and_(
        pc.is_valid(batch["conv_id"]), pc.is_valid(batch["turn_idx"])
    )
    batch = batch.filter(keep)
    cols, names = [], []
    for name in batch.column_names:
        col = batch[name]
        if name == "conv_id":
            col = col.cast(pa.string())
        elif name == "turn_idx":
            col = col.cast(pa.int32())
        elif name in ("text", "role"):
            col = col.cast(pa.string())
        cols.append(col)
        names.append(name)
    return pa.Table.from_arrays([c.combine_chunks() for c in cols], names=names)


def ingest_transcripts(
    src_path: str,
    out_dir: str,
    fmt: str | None = None,
    rows_per_file: int = 65536,
    count_input: bool = True,
) -> dict:
    """Normalize a JSONL / CSV / Parquet transcript source into the
    partitioned-Parquet layout the index build consumes.

    ``fmt`` is inferred from the file extension when omitted
    (.jsonl/.json → JSON lines, .csv → CSV, .parquet → Parquet
    passthrough-normalize). ``out_dir`` must be empty or absent — a
    pre-populated directory would inflate the reported counts and leak
    stale files into subsequent index builds. Returns
    {rows, files, dropped_rows, out_dir}; ``dropped_rows`` counts
    malformed rows (null conv_id/turn_idx) removed by normalization.
    """
    import ray.data as rd

    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise ValueError(
            f"out_dir {out_dir!r} is not empty; refusing to mix normalized "
            "output with existing files"
        )

    if fmt is None:
        base = (
            src_path if not os.path.isdir(src_path) else os.listdir(src_path)[0]
        ).lower()
        # compressed text sources: Ray/Arrow auto-detect the codec from
        # the suffix, so inference looks through it (.jsonl.gz etc.)
        for comp in (".gz", ".zst", ".bz2"):
            if base.endswith(comp):
                base = base[: -len(comp)]
                break
        ext = os.path.splitext(base)[1]
        fmt = {".jsonl": "json", ".json": "json", ".csv": "csv", ".parquet": "parquet"}.get(
            ext
        )
        if fmt is None:
            raise ValueError(f"cannot infer format from {src_path!r}")

    if fmt == "json":
        ds = rd.read_json(src_path)
    elif fmt == "csv":
        ds = rd.read_csv(src_path)
    elif fmt == "parquet":
        ds = rd.read_parquet(src_path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")

    # Parquet counts are metadata-only (free); text formats pay one
    # extra source pass (lines for JSONL, a re-parse for CSV) — skip it
    # with count_input=False when the dropped_rows metric isn't needed.
    input_rows = (
        _count_input_rows(src_path, fmt, ds) if count_input else None
    )
    ds = ds.map_batches(_normalize, batch_format="pyarrow", zero_copy_batch=True)
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir, min_rows_per_file=rows_per_file)
    import pyarrow.parquet as pq

    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    rows = sum(pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows for f in files)
    return {
        "rows": rows,
        "files": len(files),
        "dropped_rows": None if input_rows is None else int(input_rows) - rows,
        "out_dir": out_dir,
    }
