"""Deterministic resumable corpus shuffle (training-data export).

Training runs need the corpus in a reproducible pseudo-random order —
re-runnable after a crash, identical across cluster sizes and engines.
The scale shape used here:

* **shuffle key** = ``md5(doc_id || ':' || seed)`` — a pure function of
  the row (the same rule :func:`..pipelines.sampling.stratified_sample`
  uses), so the order needs NO RNG state, no coordination, and a DuckDB
  oracle can re-derive it;
* **prefix-range sharding**: the key's first two hex chars pick one of
  ``num_shards`` contiguous key ranges, so the GLOBAL shuffled order is
  just shard 0..N-1 concatenated, each shard sorted by key — no global
  sort barrier, no sample-based range partitioning; every shard is one
  independent bounded task;
* **resume**: one Parquet file per shard, written atomically
  (``.tmp`` + rename); a re-run skips shards whose file already exists
  — the killed-run-resumes-identically contract the index build has.

``shuffle_manifest`` is the driver-checkable surface: the (doc_id,
shuffle_key, shard) assignment, value-exact against SQL; the full
export + global-order reconstruction is covered in pytest.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

_PREFIX_SPACE = 256  # two hex chars


def _shuffle_key(doc_id: int, seed: int) -> str:
    return hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()


def shuffle_manifest(sf_dir: str, seed: int = 0, num_shards: int = 16):
    """(doc_id, shuffle_key, shard) for every document — the shuffle
    assignment, deterministic and SQL-oracle-checkable. Global shuffled
    order = ORDER BY (shard, shuffle_key) = ORDER BY shuffle_key (the
    shard is a key-prefix range)."""
    import ray.data as rd

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        keys = [_shuffle_key(int(i), seed) for i in ids]
        shards = np.asarray(
            [int(k[:2], 16) * num_shards // _PREFIX_SPACE for k in keys],
            np.int64,
        )
        return pa.Table.from_arrays(
            [
                batch["doc_id"],
                pa.array(keys, pa.string()),
                pa.array(shards),
            ],
            names=["doc_id", "shuffle_key", "shard"],
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def shuffle_export(
    sf_dir: str, out_dir: str, seed: int = 0, num_shards: int = 16
) -> dict:
    """Write the corpus in deterministic shuffled order: one Parquet
    file per key-prefix shard, rows sorted by shuffle_key inside it.
    Reading shard 0..N-1 in order yields the exact global shuffle.

    Shape: ONE streaming pass assigns keys (dropping rows of shards
    already on disk — the resume path costs only the scan), then ONE
    ``groupby(shard)`` shuffle delivers each shard to one task that
    sorts it by key and writes atomically (``.tmp`` + rename). Shard
    sizes are ~corpus/num_shards, so size ``num_shards`` to the target
    file size, not the cluster. Idempotent resume: re-running skips
    complete shards and reproduces the rest byte-identically.
    Returns {shards_written, shards_skipped, rows, out_dir}."""
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    done = {
        s
        for s in range(num_shards)
        if os.path.isfile(os.path.join(out_dir, f"shard-{s:05d}.parquet"))
    }

    def assign_full(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        keys = [_shuffle_key(int(i), seed) for i in ids]
        shards = np.asarray(
            [int(k[:2], 16) * num_shards // _PREFIX_SPACE for k in keys],
            np.int64,
        )
        keep = np.asarray([s not in done for s in shards], bool)
        out = batch.filter(pa.array(keep))
        out = out.append_column(
            "shuffle_key",
            pa.array([k for k, m in zip(keys, keep) if m], pa.string()),
        )
        return out.append_column("shard", pa.array(shards[keep]))

    written = 0
    if len(done) < num_shards:

        def write_group(group: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            shard = int(group["shard"][0].as_py())
            tab = group.drop_columns(["shard"])
            tab = tab.take(pa.compute.sort_indices(tab["shuffle_key"]))
            path = os.path.join(out_dir, f"shard-{shard:05d}.parquet")
            pq.write_table(tab, path + ".tmp")
            os.replace(path + ".tmp", path)
            return pa.Table.from_pydict(
                {"shard": [shard], "rows": [tab.num_rows]}
            )

        stats = (
            rd.read_parquet(f"{sf_dir}/documents.parquet")
            .map_batches(assign_full, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("shard")
            .map_groups(write_group, batch_format="pyarrow")
            .to_pandas()
        )
        written = len(stats)
        # a shard with zero rows never reaches its group: write it empty
        # so resume bookkeeping stays by-file
        import pyarrow.parquet as pq

        doc_schema = pq.read_schema(f"{sf_dir}/documents.parquet")
        empty = pa.schema(
            list(doc_schema) + [pa.field("shuffle_key", pa.string())]
        ).empty_table()
        for s in range(num_shards):
            path = os.path.join(out_dir, f"shard-{s:05d}.parquet")
            if s not in done and not os.path.isfile(path):
                pq.write_table(empty, path + ".tmp")
                os.replace(path + ".tmp", path)

    import pyarrow.parquet as pq

    rows = sum(
        pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
        for f in sorted(os.listdir(out_dir))
        if f.endswith(".parquet")
    )
    return {
        "shards_written": written,
        "shards_skipped": len(done),
        "rows": rows,
        "out_dir": out_dir,
    }
