"""End-to-end inverted-index build over transcript Parquet (Ray Data).

Dataflow per build partition (a disjoint group of input files) — ONE
read, ONE analyze, ONE shuffle:

    row-group-aligned read chunks (cols: conv_id, turn_idx, text)
      one Ray task per chunk: read → FragmentBatcher (vectorized
        whole-batch combiner) → fragment rows pre-split per group
        (posting gkeys ≥ 0 + doc-stat sentinels gkey < 0), returned as
        num_returns=n_route buffer-owned Arrow tables
      raw static-domain exchange                      # THE shuffle
        (group domain is KNOWN: 2^salt_bits·term_parts + 2^salt_bits;
         one writer task per group pulls its slices — no boundary
         sampling, no sort barrier; exchange="dataset" keeps the
         byte-identical groupby("gkey") Dataset path)
      SegmentWriter → segments/seg-*.parquet
                    → doc_stats/salt=*/ (sentinel groups)
                    → per-group manifest rows

Finalize (across partitions):
    read segments (term, df) → groupby(term).sum → term_stats/   (global df)
    read doc_stats (dl)      → Count, Sum        → meta.json (N, avgdl)

Checkpoint / lineage / resume (north_rule): each partition writes its
output under ``partitions/p{i:05d}/`` and then an atomic manifest JSON
``manifest/p{i:05d}.json`` recording input files, analyzer-config
fingerprint, metrics (docs, postings, bytes, seconds) and output files.
A rerun skips partitions whose manifest exists *and* matches the
current config fingerprint + input list; finalize runs over whatever
partitions are complete. Killing the build between partitions and
rerunning produces byte-identical index content (tests/test_resume).

The reference equivalent is the single-threaded partial-index dump +
fastmerge + infos.idx write (``themis/indexer/Indexer.java:238-500``,
776-902) — here the Ray Data streaming executor parallelizes the scan
and the shuffle replaces the merge; nothing is materialized driver-side
except tiny metrics tables.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field

import pyarrow.parquet as pq

from ..functions.analyzer import AnalyzerConfig, DEFAULT_CONFIG
from ..stages.encode import SegmentWriter
from ..stages.tokenize import FragmentBatcher


@dataclass
class BuildConfig:
    salt_bits: int = 2  # 2^salt_bits doc-range shards (salting + serving shards)
    term_parts: int = 8  # term-hash partitions per salt bucket
    with_positions: bool = True
    analyzer: AnalyzerConfig = field(default_factory=AnalyzerConfig)
    batch_size: int = 1024  # turns per tokenize batch
    # rows per read chunk (the scan+exchange parallelism unit). 0 = auto:
    # ~3 chunks per CPU-share per partition, floor 16384 — bigger chunks
    # mean fewer fragment rows/objects through the exchange (measured
    # ~25-30% faster at 6.4M turns / 32 CPUs) while keeping every core fed
    read_chunk_rows: int = 0
    num_partitions: int = 1  # build partitions (checkpoint granularity)
    store_text: bool = False  # doc_stats doubles as a doc store (FULL results)
    with_role: bool = False  # carry the role column into doc_stats (fielded search)
    # "hash": doc_id = blake2b(conv, turn) (stable, shuffle-free; random
    # ids don't delta-compress). "dense": salt stays the hash's top bits
    # but the rest is a dense per-salt rank assigned in (file, row)
    # order via a cheap counting pre-pass — posting gaps then shrink to
    # ~corpus/salt density and the doc blobs varint-compress 3-5x. The
    # design point for 10^12 turns (NOTES.md).
    doc_id_mode: str = "hash"
    # partition pipelines run concurrently (driver threads; each is an
    # independent Ray Data dataset) — overlaps the per-pipeline fixed
    # latency (startup + shuffle barrier) that otherwise serializes;
    # checkpoint semantics unchanged (manifest written per completion)
    build_concurrency: int = 4
    # "raw": static-domain shuffle with raw Ray tasks (default; see
    # build_partition). "dataset": Dataset groupby(gkey) sort shuffle.
    # Output is byte-identical either way; not part of the fingerprint.
    exchange: str = "raw"

    @property
    def num_shards(self) -> int:
        return 1 << self.salt_bits

    def fingerprint(self) -> str:
        # dk=2: vectorized splitmix64 doc-id hash (stages/tokenize.py) —
        # doc ids differ from dk=1 indexes, so the fingerprint isolates them
        return (
            f"{self.analyzer.fingerprint};salt_bits={self.salt_bits};"
            f"parts={self.term_parts};pos={int(self.with_positions)};"
            f"text={int(self.store_text)};role={int(self.with_role)};"
            f"ids={self.doc_id_mode};dk=2"
        )


def _stub_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` importable from threads.

    Ray's read path imports it per read_parquet() and catches only
    ModuleNotFoundError (path_util._is_http_filesystem). Without
    aiohttp the import always fails — harmless sequentially, but two
    threads racing the failed import can observe a partially-initialized
    module and get a plain ImportError that Ray does NOT catch. Register
    a sentinel module (an HTTPFileSystem class nothing isinstance-matches)
    once, so concurrent partition builds can't race it.
    """
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
        return
    except ImportError:
        pass
    mod = types.ModuleType("fsspec.implementations.http")
    mod.HTTPFileSystem = type("HTTPFileSystem", (), {})
    sys.modules["fsspec.implementations.http"] = mod


def _list_input_files(input_path: str | list[str]) -> list[str]:
    if isinstance(input_path, list):
        return sorted(input_path)
    if os.path.isdir(input_path):
        return sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if f.endswith(".parquet")
        )
    return [input_path]


def _partition_files(files: list[str], n: int) -> list[list[str]]:
    n = max(1, min(n, len(files)))
    return [files[i::n] for i in range(n)]


def _atomic_write_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def compute_dense_offsets(files: list[str], salt_bits: int) -> dict:
    """Counting pre-pass for doc_id_mode="dense": rows per (file, salt)
    → each file's starting dense rank within every salt. One parallel
    pass over (conv_id, turn_idx) only; deterministic in file order."""
    import numpy as np
    import ray.data as rd

    from ..stages.tokenize import doc_keys_batch

    n_salts = 1 << salt_bits
    shift = np.uint64(63 - salt_bits)

    def count_file(batch: dict) -> "pa.Table":
        import pyarrow as pa

        paths, counts = [], []
        for f in batch["file"]:
            tab = pq.read_table(f, columns=["conv_id", "turn_idx"])
            ids = doc_keys_batch(
                tab["conv_id"].to_pylist(), tab["turn_idx"].to_pylist()
            )
            salts = (ids >> shift).astype(np.int64)
            counts.append(np.bincount(salts, minlength=n_salts).astype(np.int64))
            paths.append(f)
        return pa.Table.from_pydict(
            {
                "file": pa.array(paths, pa.string()),
                "counts": pa.array([c.tolist() for c in counts]),
            }
        )

    tab = (
        rd.from_items([{"file": f} for f in files])
        .map_batches(count_file, batch_size=1)  # one task per file
        .to_pandas()
    )
    by_file = dict(zip(tab["file"], tab["counts"]))
    offsets: dict[str, list[int]] = {}
    running = [0] * n_salts
    for f in files:  # deterministic file order defines the dense ranks
        offsets[f] = list(running)
        for s, c in enumerate(by_file[f]):
            running[s] += int(c)
    return offsets


class _DenseFileReader:
    """from_items(file) → that file's turns with precomputed dense
    doc_ids ((salt << shift) + file_offset[salt] + rank-in-file-salt);
    file row order is definitional, so ids are stable across runs."""

    def __init__(self, salt_bits: int, offsets: dict, columns: list[str]):
        self.salt_bits = salt_bits
        self.offsets = offsets
        self.columns = columns

    def __call__(self, batch: dict) -> "pa.Table":
        import numpy as np
        import pyarrow as pa

        from ..stages.tokenize import doc_keys_batch

        out = []
        shift = np.uint64(63 - self.salt_bits)
        for f in batch["file"]:
            tab = pq.read_table(f, columns=self.columns)
            hids = doc_keys_batch(
                tab["conv_id"].to_pylist(), tab["turn_idx"].to_pylist()
            )
            salts = (hids >> shift).astype(np.int64)
            # rank of each row within its salt, in file row order
            order = np.argsort(salts, kind="stable")
            sorted_salts = salts[order]
            n = salts.size
            new = np.empty(n, bool)
            if n:
                new[0] = True
                new[1:] = sorted_salts[1:] != sorted_salts[:-1]
            group_start = np.repeat(np.flatnonzero(new), np.diff(np.concatenate((np.flatnonzero(new), [n]))))
            within = np.arange(n, dtype=np.int64) - group_start
            rank = np.empty(n, np.int64)
            rank[order] = within
            base = np.asarray(self.offsets[f], np.int64)[salts]
            dense = (salts.astype(np.uint64) << shift) + (base + rank).astype(np.uint64)
            out.append(tab.append_column("doc_id", pa.array(dense.astype(np.int64))))
        return pa.concat_tables(out)


def _plan_read_chunks(
    files: list[str], target_rows: int, min_rows: int = 16384, slots: int = 0
) -> list[dict]:
    """Split the input files into row-group-aligned read chunks of
    ~target_rows each — the unit of read+analyze parallelism.

    ``target_rows=0`` sizes chunks automatically: total rows / ``slots``
    (floor ``min_rows``) so the scan yields ~``slots`` roughly equal
    tasks. Ray's own read_parquet plans its read tasks from driver-side
    footer metadata too, but for small per-partition file lists it
    collapses to a single read task (measured: one 4.6 s serial read per
    partition at 32 CPUs); explicit chunks keep the scan parallel at any
    partition size. Footer-only reads: ~1 ms/file on the driver, the
    same metadata pass read_parquet performs."""
    per_file: list[tuple[str, list[int]]] = []
    total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        rg_rows = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
        per_file.append((f, rg_rows))
        total += sum(rg_rows)
    if target_rows <= 0:
        target_rows = max(min_rows, total // max(1, slots))
    chunks: list[dict] = []
    for f, rg_rows in per_file:
        nrg = len(rg_rows)
        lo = 0
        while lo < nrg:
            hi, acc = lo, 0
            while hi < nrg and acc < target_rows:
                acc += rg_rows[hi]
                hi += 1
            chunks.append({"file": f, "rg_lo": lo, "rg_hi": hi})
            lo = hi
    return chunks


class _ChunkReader:
    """Read-chunk items → Arrow turns (used inside _ReadAnalyzeTask)."""

    def __init__(self, columns: list[str]):
        self.columns = columns

    def __call__(self, batch: dict) -> "pa.Table":
        import pyarrow as pa

        out = []
        for f, lo, hi in zip(batch["file"], batch["rg_lo"], batch["rg_hi"]):
            pf = pq.ParquetFile(f)
            out.append(pf.read_row_groups(range(int(lo), int(hi)), columns=self.columns))
        return pa.concat_tables(out)


class _ReadAnalyzeTask:
    """One Ray task per read chunk: read → slice into ``batch_size``-row
    analyzer batches → FragmentBatcher each → concat fragment rows.

    Composed explicitly instead of two chained ``map_batches`` because
    Ray fuses them and then applies the downstream ``batch_size`` as a
    min-rows input-bundling target against the ONE-ROW chunk-item
    blocks — measured collapse of the whole partition scan to a single
    task. One UDF with default batching keeps one task per item block
    while preserving the combiner granularity (slices are zero-copy)."""

    def __init__(self, reader, batcher, batch_size: int):
        self.reader = reader
        self.batcher = batcher
        self.batch_size = batch_size

    def __call__(self, batch: dict) -> "pa.Table":
        import pyarrow as pa

        from ..stages.tokenize import FRAGMENT_SCHEMA

        turns = self.reader(batch)
        outs = []
        for lo in range(0, turns.num_rows, self.batch_size):
            outs.append(self.batcher(turns.slice(lo, self.batch_size)))
        return pa.concat_tables(outs) if outs else FRAGMENT_SCHEMA.empty_table()


import pyarrow as _pa

_MANIFEST_SCHEMA = _pa.schema(
    [
        ("file", _pa.string()),
        ("gkey", _pa.int64()),
        ("salt", _pa.int64()),
        ("kind", _pa.string()),
        ("n_terms", _pa.int64()),
        ("n_postings", _pa.int64()),
        ("bytes", _pa.int64()),
        ("n_docs", _pa.int64()),
        ("sum_dl", _pa.int64()),
    ]
)


def _analyze_route(chunk: dict, reader, batcher, batch_size: int, n_pos: int, n_route: int):
    """One map task of the raw static-domain exchange: read+analyze one
    chunk, then split the fragment table by group into ``n_route``
    separate return objects (invoked with ``num_returns=n_route``), so
    each writer task later pulls exactly its group's bytes from the
    object store. Routes: posting gkeys map to themselves
    ([0, n_salts·term_parts)); doc-stat sentinels ``-(salt+1)`` map to
    ``n_pos + salt``."""
    import numpy as np

    tab = _ReadAnalyzeTask(reader, batcher, batch_size)(
        {k: [v] for k, v in chunk.items()}
    )
    gk = tab["gkey"].to_numpy()
    route = np.where(gk >= 0, gk, n_pos + (-gk - 1))
    order = np.argsort(route, kind="stable")
    sorted_tab = tab.take(order)
    sr = route[order]
    bounds = np.searchsorted(sr, np.arange(n_route + 1))
    empty = sorted_tab.schema.empty_table()

    def owned(lo: int, hi: int):
        # CRITICAL: a zero-copy slice PICKLES ITS ENTIRE PARENT buffer
        # (pyarrow keeps the full buffer in __reduce__) — returning raw
        # slices here ships each chunk's whole fragment table n_route
        # times through the object store (measured 70x byte
        # amplification → store spill → build wall-time blowup at
        # multi-million-turn partitions). take() materializes each
        # route's rows into their own buffers before Ray serializes.
        if hi <= lo:
            return empty
        return sorted_tab.take(np.arange(lo, hi))

    return tuple(
        owned(int(bounds[r]), int(bounds[r + 1])) for r in range(n_route)
    )


def _write_route_group(seg_dir: str, ds_dir: str, with_positions: bool, *parts):
    """One writer task per route: concatenate the chunks' fragment
    slices (chunk submission order — deterministic) and encode/write via
    SegmentWriter. Empty routes return an empty manifest table."""
    import pyarrow as pa

    from ..stages.encode import SegmentWriter

    tabs = [p for p in parts if p.num_rows]
    if not tabs:
        return pa.Table.from_pydict(
            {c: [] for c in SegmentWriter.MANIFEST_COLS}
        ).cast(_MANIFEST_SCHEMA)
    group = pa.concat_tables(tabs)
    writer = SegmentWriter(seg_dir, with_positions, ds_dir=ds_dir)
    return writer(group).cast(_MANIFEST_SCHEMA)


def build_partition(
    pid: int, files: list[str], out_dir: str, cfg: BuildConfig,
    dense_offsets: dict | None = None,
) -> dict:
    """Build one partition's doc_stats + segments; return its manifest."""
    import ray.data as rd

    t0 = time.time()
    pdir = os.path.join(out_dir, "partitions", f"p{pid:05d}")
    seg_dir = os.path.join(pdir, "segments")
    ds_dir = os.path.join(pdir, "doc_stats")
    os.makedirs(seg_dir, exist_ok=True)

    cols = ["conv_id", "turn_idx", "text"] + (["role"] if cfg.with_role else [])
    batcher = FragmentBatcher(
        cfg.analyzer,
        cfg.salt_bits,
        cfg.term_parts,
        cfg.with_positions,
        emit_doc_stats=True,
        store_text=cfg.store_text,
        with_role=cfg.with_role,
    )
    if cfg.doc_id_mode == "dense":
        # per-file tasks: file row order defines the dense ranks
        # (parallelism = #files; dense mode targets many-file corpora)
        items = [{"file": f} for f in files]
        reader = _DenseFileReader(cfg.salt_bits, dense_offsets, cols)
    else:
        # Row-group-chunked scan (see _plan_read_chunks): read+analyze
        # parallelism stays >= chunk count even for few-file partitions.
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        slots = max(4, (3 * ncpu) // max(1, cfg.build_concurrency))
        items = _plan_read_chunks(
            files, target_rows=cfg.read_chunk_rows, slots=slots
        )
        reader = _ChunkReader(cols)

    os.makedirs(ds_dir, exist_ok=True)

    if cfg.exchange == "raw":
        # Raw static-domain exchange (the default): the group-key domain
        # is KNOWN and tiny (n_salts·term_parts posting groups + n_salts
        # doc-stat sentinels), so the Dataset groupby's boundary
        # sampling, sort barrier and group-splitting buy nothing — and
        # measured ~4.4 s of fixed per-build latency that no CPU count
        # shrinks (BASELINE.md round 2). Instead: one Ray task per read
        # chunk returns its fragments pre-split by group
        # (num_returns=n_route), one writer task per group concatenates
        # its slices (chunk order — deterministic) and encodes. Output
        # is byte-identical to the Dataset path (SegmentWriter's global
        # (term, doc) sort is input-order-independent;
        # tests/test_raw_exchange.py). Same materialization bound as
        # Ray's sort shuffle: one partition's fragments live in the
        # object store between map and write — the build partition is
        # the memory unit, and the store spills past it.
        import ray

        n_pos = cfg.num_shards * cfg.term_parts
        n_route = n_pos + cfg.num_shards
        analyze = ray.remote(num_returns=n_route)(_analyze_route)
        # writers are memory-bandwidth-bound (big gathers + lexsort +
        # encode); num_cpus=2 halves their concurrency so co-scheduled
        # compute-bound analyze tasks keep the cores busy instead of
        # thrashing the bus (tunable via THEMIS_WRITER_CPUS)
        writer_cpus = float(os.environ.get("THEMIS_WRITER_CPUS", "2"))
        write = ray.remote(num_cpus=writer_cpus)(_write_route_group)
        reader_ref = ray.put(reader)
        batcher_ref = ray.put(batcher)
        chunk_refs = [
            analyze.remote(
                item, reader_ref, batcher_ref, cfg.batch_size, n_pos, n_route
            )
            for item in items
        ]
        man_refs = [
            write.remote(
                seg_dir,
                ds_dir,
                cfg.with_positions,
                *[chunk_refs[i][r] for i in range(len(chunk_refs))],
            )
            for r in range(n_route)
        ]
        import pyarrow as pa

        manifest_rows = pa.concat_tables(ray.get(man_refs)).to_pandas()
    else:
        # Dataset-native path (exchange="dataset"): ONE pass per chunk
        # (read + posting fragments + packed doc-stat rows from the same
        # analyze), then ONE groupby(gkey) shuffle routing both to their
        # writers. Kept for identity testing and as the reference shape.
        frags = rd.from_items(items).map_batches(
            _ReadAnalyzeTask(reader, batcher, cfg.batch_size)
        )
        writer = SegmentWriter(seg_dir, cfg.with_positions, ds_dir=ds_dir)

        def write_group(group):
            return writer(group)

        grouped = frags.groupby("gkey").map_groups(write_group, batch_format="pyarrow")
        manifest_rows = grouped.to_pandas()  # tiny: one row per gkey group
        if os.environ.get("THEMIS_BUILD_STATS"):
            print(f"=== partition p{pid} stats ({time.time()-t0:.1f}s) ===\n", grouped.stats(), flush=True)
    segs = manifest_rows[manifest_rows["kind"] == "segment"]
    dstats = manifest_rows[manifest_rows["kind"] == "doc_stats"]

    manifest = {
        "partition": pid,
        "input_files": files,
        "config_fingerprint": cfg.fingerprint(),
        "metrics": {
            "n_docs": int(dstats["n_docs"].sum()),
            "sum_dl": int(dstats["sum_dl"].sum()),
            "n_postings": int(segs["n_postings"].sum()),
            "n_groups": int(len(segs)),
            "seg_bytes": int(segs["bytes"].sum()),
            "build_seconds": round(time.time() - t0, 3),
        },
        "segments": sorted(segs["file"].tolist()),
    }
    return manifest


def build_index(
    input_path: str | list[str],
    out_dir: str,
    cfg: BuildConfig | None = None,
) -> dict:
    """Build (or resume) the full index at ``out_dir``. Returns meta dict."""
    cfg = cfg or BuildConfig()
    files = _list_input_files(input_path)
    parts = _partition_files(files, cfg.num_partitions)
    man_dir = os.path.join(out_dir, "manifest")
    os.makedirs(man_dir, exist_ok=True)

    built, skipped = 0, 0
    todo: list[tuple[int, list[str], str]] = []
    for pid, pfiles in enumerate(parts):
        mpath = os.path.join(man_dir, f"p{pid:05d}.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                prev = json.load(f)
            if (
                prev.get("config_fingerprint") == cfg.fingerprint()
                and prev.get("input_files") == pfiles
            ):
                skipped += 1
                continue  # checkpointed partition: skip (resume)
        todo.append((pid, pfiles, mpath))

    dense_offsets = None
    if todo and cfg.doc_id_mode == "dense":
        # global counting pass over ALL files (dense ranks must be
        # consistent across partitions and across resumes)
        dense_offsets = compute_dense_offsets(files, cfg.salt_bits)

    if len(todo) <= 1 or cfg.build_concurrency <= 1:
        for pid, pfiles, mpath in todo:
            _atomic_write_json(
                mpath, build_partition(pid, pfiles, out_dir, cfg, dense_offsets)
            )
            built += 1
    else:
        from concurrent.futures import ThreadPoolExecutor, as_completed

        _stub_fsspec_http()

        with ThreadPoolExecutor(min(cfg.build_concurrency, len(todo))) as ex:
            futs = {
                ex.submit(
                    build_partition, pid, pfiles, out_dir, cfg, dense_offsets
                ): mpath
                for pid, pfiles, mpath in todo
            }
            for fut in as_completed(futs):
                # manifest lands as each partition completes, so a crash
                # mid-way still leaves finished partitions resumable
                _atomic_write_json(futs[fut], fut.result())
                built += 1

    t_fin = time.time()
    meta = finalize_index(out_dir, cfg, n_partitions=len(parts))
    if os.environ.get("THEMIS_BUILD_STATS"):
        print(f"=== finalize {time.time()-t_fin:.1f}s ===", flush=True)
    meta["partitions_built"] = built
    meta["partitions_skipped"] = skipped
    return meta


def append_to_index(
    index_dir: str, input_path: str | list[str], cfg: BuildConfig | None = None
) -> dict:
    """Incrementally ingest new turns into an existing index.

    New input files become new build partitions (ids continue after the
    existing ones); finalize re-aggregates term_stats and corpus stats,
    so BM25 idf/avgdl reflect the combined corpus. Derived artifacts
    that would be stale — ``compacted/`` and ``norms/`` — are removed
    (rerun compact_index / build_norms afterwards if needed).

    Constraints: the config fingerprint must match the existing index
    (mixing analyzers would corrupt semantics), and dense doc-id mode is
    not appendable (its per-salt ranks are assigned over the original
    file list) — build with the default hash ids to append.
    """
    import shutil

    cfg = cfg or BuildConfig()
    meta = load_meta(index_dir)
    if meta["config_fingerprint"] != cfg.fingerprint():
        raise ValueError(
            f"config mismatch: index={meta['config_fingerprint']!r} "
            f"append={cfg.fingerprint()!r}"
        )
    if cfg.doc_id_mode == "dense":
        raise ValueError("doc_id_mode='dense' indexes are not appendable")

    man_dir = os.path.join(index_dir, "manifest")
    existing = sorted(f for f in os.listdir(man_dir) if f.endswith(".json"))
    next_pid = len(existing)
    new_files = _list_input_files(input_path)
    # skip files any existing partition already ingested (idempotence)
    seen: set[str] = set()
    for f in existing:
        with open(os.path.join(man_dir, f)) as fh:
            seen.update(json.load(fh)["input_files"])
    new_files = [f for f in new_files if f not in seen]

    for i, f in enumerate(new_files):
        pid = next_pid + i
        manifest = build_partition(pid, [f], index_dir, cfg)
        _atomic_write_json(os.path.join(man_dir, f"p{pid:05d}.json"), manifest)

    # stale derived artifacts
    shutil.rmtree(os.path.join(index_dir, "compacted"), ignore_errors=True)
    shutil.rmtree(os.path.join(index_dir, "norms"), ignore_errors=True)

    meta = finalize_index(index_dir, cfg, n_partitions=next_pid + len(new_files))
    meta["appended_files"] = len(new_files)
    return meta


def finalize_index(out_dir: str, cfg: BuildConfig, n_partitions: int) -> dict:
    """Global term df aggregation + corpus stats; idempotent."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    man_dir = os.path.join(out_dir, "manifest")
    manifests = []
    for f in sorted(os.listdir(man_dir)):
        if f.endswith(".json"):
            with open(os.path.join(man_dir, f)) as fh:
                manifests.append(json.load(fh))

    n_docs = sum(m["metrics"]["n_docs"] for m in manifests)
    sum_dl = sum(m["metrics"]["sum_dl"] for m in manifests)
    # averageLength = sum/count as a plain double division (Indexer.java:472)
    avgdl = sum_dl / n_docs if n_docs else 0.0

    seg_files = []
    for m in manifests:
        pdir = os.path.join(out_dir, "partitions", f"p{m['partition']:05d}", "segments")
        seg_files.extend(os.path.join(pdir, s) for s in m["segments"])

    ts_dir = os.path.join(out_dir, "term_stats")
    if seg_files:
        import shutil

        import ray

        tmp_ts = ts_dir + ".tmp"
        shutil.rmtree(tmp_ts, ignore_errors=True)

        # Chunked partial-df pass: ~2 tasks/CPU each reading a slice of
        # the segment files' (term, df) columns and pre-summing with the
        # Arrow groupby kernel, then ONE small groupby(term) shuffle.
        # (A flat read_parquet here spawned one task per segment file —
        # hundreds of fixed-overhead tasks plus two sort barriers for a
        # tiny table; the combiner bounds the shuffle at
        # #chunks × distinct-terms rows.) No on-disk sort: TermDirectory
        # re-sorts its Arrow column at load (state/searcher.py).
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        nchunks = max(1, min(len(seg_files), 2 * ncpu))
        items = [{"files": seg_files[i::nchunks]} for i in range(nchunks)]

        def partial_df(batch: dict) -> "pa.Table":
            import pyarrow as pa

            tabs = [
                pq.read_table(f, columns=["term", "df"])
                for files in batch["files"]
                for f in files
            ]
            cat = pa.concat_tables(tabs)
            agg = pa.TableGroupBy(cat, "term").aggregate([("df", "sum")])
            return agg.rename_columns(["term", "df"])

        (
            rd.from_items(items)
            .map_batches(partial_df, batch_size=1)  # one task per chunk
            .groupby("term")
            .aggregate(Sum("df", alias_name="df"))
            .write_parquet(tmp_ts)
        )
        # tmp + swap: a re-finalize (e.g. append_to_index) must REPLACE
        # the directory — write_parquet into an existing dir adds files,
        # which would double-count df
        shutil.rmtree(ts_dir, ignore_errors=True)
        os.replace(tmp_ts, ts_dir)

    meta = {
        "version": 1,
        "n_docs": int(n_docs),
        "sum_dl": int(sum_dl),
        "avgdl": avgdl,
        "salt_bits": cfg.salt_bits,
        "num_shards": cfg.num_shards,
        "term_parts": cfg.term_parts,
        "with_positions": cfg.with_positions,
        "config_fingerprint": cfg.fingerprint(),
        "analyzer": asdict(cfg.analyzer),
        "n_partitions": n_partitions,
        "n_postings": sum(m["metrics"]["n_postings"] for m in manifests),
    }
    _atomic_write_json(os.path.join(out_dir, "meta.json"), meta)
    return meta


def load_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "meta.json")) as f:
        return json.load(f)


def compact_index(index_dir: str) -> str:
    """Merge per-partition posting runs into one segment per gkey.

    A build with P checkpoint partitions leaves every term with up to P
    runs per shard; query-time decode cost then scales with P (the
    reference's ``fastmerge`` solved the same problem for its partial
    indexes — ``themis/indexer/Indexer.java:776-902``). Compaction is a
    Ray pipeline over gkey groups: each task reads that gkey's segment
    files from every partition, merge-sorts each term's doc-sorted runs
    (concatenate + argsort — runs overlap in doc range because input
    partitions split by file, not by doc), re-encodes, and atomically
    writes ``compacted/segments/seg-<gkey>.parquet``. Doc stats are
    hard-linked/copied per salt. Idempotent; derived data only — the
    partition manifests remain the source of truth for resume.
    ``ShardIndex`` prefers the compacted layout when present.
    """
    import shutil

    import numpy as np
    import ray.data as rd

    from ..stages.codec import (
        all_tfs,
        decode_all_docs,
        decode_positions,
        encode_postings_flat,
        ranges_to_indices,
        skips_from_bytes,
        skips_to_bytes,
    )
    from ..stages.encode import SEGMENT_SCHEMA

    meta = load_meta(index_dir)
    with_pos = bool(meta.get("with_positions", True))
    part_root = os.path.join(index_dir, "partitions")
    files_by_gkey: dict[int, list[str]] = {}
    ds_dirs: list[str] = []
    for pdir in sorted(os.listdir(part_root)):
        seg_dir = os.path.join(part_root, pdir, "segments")
        if os.path.isdir(seg_dir):
            for fname in sorted(os.listdir(seg_dir)):
                if fname.endswith(".parquet"):
                    gkey = int(fname[4:-8])
                    files_by_gkey.setdefault(gkey, []).append(
                        os.path.join(seg_dir, fname)
                    )
        dsd = os.path.join(part_root, pdir, "doc_stats")
        if os.path.isdir(dsd):
            ds_dirs.append(dsd)

    out_root = os.path.join(index_dir, "compacted")
    tmp_root = out_root + ".tmp"
    shutil.rmtree(tmp_root, ignore_errors=True)
    out_seg = os.path.join(tmp_root, "segments")
    os.makedirs(out_seg, exist_ok=True)

    def compact_group(batch: dict) -> "pa.Table":
        import pyarrow as pa

        out_rows = []
        for gkey, files in zip(batch["gkey"], batch["files"]):
            gkey = int(gkey)
            tabs = [pq.read_table(f) for f in files]
            # term -> list of (tab_idx, row)
            runs: dict[str, list[tuple[int, int]]] = {}
            salt = None
            for ti, tab in enumerate(tabs):
                salt = int(tab["salt"][0].as_py()) if tab.num_rows else salt
                for row, term in enumerate(tab["term"].to_pylist()):
                    runs.setdefault(term, []).append((ti, row))
            o_terms, o_df, o_maxtf, o_docs, o_tfs, o_pos, o_skips = (
                [], [], [], [], [], [], []
            )
            n_postings = 0
            for term in sorted(runs):
                ids_c, tfs_c, cnt_c, flat_c = [], [], [], []
                for ti, row in runs[term]:
                    tab = tabs[ti]
                    skips = skips_from_bytes(tab["skips"][row].as_buffer())
                    ids = decode_all_docs(tab["docs"][row].as_buffer(), skips)
                    ids_c.append(ids)
                    tfs_c.append(all_tfs(tab["tfs"][row].as_buffer()))
                    if with_pos:
                        pos_blob = tab["pos"][row].as_buffer()
                        plists = decode_positions(bytes(pos_blob), int(ids.size))
                        cnt_c.append(
                            np.asarray([p.size for p in plists], np.int64)
                        )
                        flat_c.append(
                            np.concatenate(plists)
                            if plists and sum(p.size for p in plists)
                            else np.empty(0, np.int64)
                        )
                ids = np.concatenate(ids_c)
                tfs = np.concatenate(tfs_c)
                order = np.argsort(ids, kind="stable")
                ids = ids[order]
                tfs = tfs[order]
                if with_pos:
                    counts = np.concatenate(cnt_c)
                    flat = np.concatenate(flat_c) if counts.sum() else np.empty(0, np.int64)
                    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
                    fcounts = counts[order]
                    fflat = flat[ranges_to_indices(starts[order], fcounts)]
                    enc = encode_postings_flat(ids, tfs, fcounts, fflat)
                else:
                    enc = encode_postings_flat(ids, tfs, None, None)
                o_terms.append(term)
                o_df.append(enc.df)
                o_maxtf.append(enc.max_tf)
                o_docs.append(enc.doc_blob)
                o_tfs.append(enc.tf_blob)
                o_pos.append(enc.pos_blob)
                o_skips.append(skips_to_bytes(enc.skips))
                n_postings += enc.df
            seg = pa.Table.from_arrays(
                [
                    pa.array(o_terms, pa.string()),
                    pa.array([salt] * len(o_terms), pa.int32()),
                    pa.array(o_df, pa.int64()),
                    pa.array(o_maxtf, pa.float64()),
                    pa.array(o_docs, pa.large_binary()),
                    pa.array(o_tfs, pa.large_binary()),
                    pa.array(o_pos, pa.large_binary()),
                    pa.array(o_skips, pa.large_binary()),
                ],
                schema=SEGMENT_SCHEMA,
            )
            fpath = os.path.join(out_seg, f"seg-{gkey:08d}.parquet")
            pq.write_table(seg, fpath + ".tmp", compression="NONE")
            os.replace(fpath + ".tmp", fpath)
            out_rows.append(
                {"gkey": gkey, "n_terms": len(o_terms), "n_postings": n_postings}
            )
        return pa.Table.from_pylist(
            out_rows
            or [{"gkey": -1, "n_terms": 0, "n_postings": 0}]
        )

    items = [{"gkey": g, "files": f} for g, f in sorted(files_by_gkey.items())]
    # batch_size=1: one task per gkey group. Without it Ray's min-rows
    # input bundling (default 1024) coalesces ALL item rows into a
    # single task — measured as compaction running serially (12 s
    # single-shot in BENCH_r02 with 64 idle cores).
    stats = (
        rd.from_items(items)
        .map_batches(compact_group, batch_size=1)
        .to_pandas()
    )

    # doc stats: re-sharded per salt under compacted/doc_stats, carrying
    # a precomputed GLOBAL (conv asc, turn asc) tie-break ordinal so
    # serving never has to materialize conv strings to sort (valid
    # across any actor packing of salts because the ordinal is global,
    # not per-salt). Fully distributed: Ray ds.sort range-partitions by
    # (conv, turn); block row-counts come from ref-bundle METADATA (no
    # driver read), so each block task gets its global row offset and
    # writes its rows per salt. The driver holds only refs + counts.
    # (ShardIndex re-sorts by doc_id at load, so per-salt file count
    # and row order are free.)
    out_ds = os.path.join(tmp_root, "doc_stats")
    ds_files = []
    for dsd in ds_dirs:
        for sdir in sorted(os.listdir(dsd)):
            if sdir.startswith("salt="):
                full = os.path.join(dsd, sdir)
                ds_files.extend(
                    os.path.join(full, f)
                    for f in sorted(os.listdir(full))
                    if f.endswith(".parquet")
                )
    if ds_files:
        import ray

        salt_bits = int(meta["salt_bits"])
        shift = 63 - salt_bits
        sorted_ds = (
            rd.read_parquet(ds_files)
            .sort(["conv_id", "turn_idx"])
            .materialize()
        )
        block_refs: list = []
        counts: list[int] = []
        for bundle in sorted_ds.iter_internal_ref_bundles():
            for ref, bmeta in bundle.blocks:
                block_refs.append(ref)
                counts.append(int(bmeta.num_rows))
        offsets = np.concatenate(([0], np.cumsum(counts)[:-1])) if counts else []

        def write_block(block, bidx: int, offset: int) -> int:
            import pyarrow as pa

            tab = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
            n = tab.num_rows
            if n == 0:
                return 0
            tab = tab.append_column(
                "tiebreak", pa.array(offset + np.arange(n, dtype=np.int64))
            )
            salts_arr = (
                tab["doc_id"].to_numpy().astype(np.uint64) >> np.uint64(shift)
            ).astype(np.int64)
            order = np.argsort(salts_arr, kind="stable")
            stab = tab.take(order)
            ssorted = salts_arr[order]
            bounds = np.flatnonzero(
                np.concatenate(([True], ssorted[1:] != ssorted[:-1]))
            )
            ends = np.concatenate((bounds[1:], [n]))
            for lo, hi in zip(bounds, ends):
                s = int(ssorted[lo])
                odir = os.path.join(out_ds, f"salt={s}")
                os.makedirs(odir, exist_ok=True)
                fpath = os.path.join(odir, f"docstats-b{bidx:06d}.parquet")
                pq.write_table(stab.slice(int(lo), int(hi - lo)), fpath + ".tmp")
                os.replace(fpath + ".tmp", fpath)
            return n

        wtask = ray.remote(write_block)
        ray.get(
            [
                wtask.remote(ref, i, int(offsets[i]))
                for i, ref in enumerate(block_refs)
            ]
        )

    _atomic_write_json(
        os.path.join(tmp_root, "compaction.json"),
        {
            "n_groups": int(len(stats)),
            "n_postings": int(stats["n_postings"].sum()),
            "source_partitions": len(ds_dirs),
        },
    )
    shutil.rmtree(out_root, ignore_errors=True)
    os.replace(tmp_root, out_root)
    return out_root


# reduce-group domain for the norm pass: bounded and corpus-size-free,
# so the groupby shuffle has ~256 groups (each a vectorized numpy
# reduction over n_docs/256 docs) instead of one group per document
_NORM_GROUPS = 256


def build_norms(index_dir: str) -> str:
    """VSM doc-norm pass (A4) as a Ray pipeline; idempotent.

    The reference streams the merged vocabulary, accumulates Σ(tf·idf)²
    per doc in one giant HashMap, then patches documents.idx
    (``themis/indexer/Indexer.java:674-761`` — its real OOM risk).
    Ray-native replacement, no full-corpus driver state:

      from_items(term_part groups) → map task per group: read that
      term-hash partition's segment rows from EVERY salt & build
      partition (a term's full postings live in one term_part, so
      global df = Σ local df needs no shuffle), decode runs, accumulate
      per-doc Σw² partials in a bounded dict → rows (dgrp, doc_id, kp,
      seq, w2) → groupby("dgrp").map_groups (dgrp = doc_id % 256 — a
      BOUNDED group domain, so the reduce is ~256 vectorized group
      calls, not one Python call per document): within each group,
      sum each doc's partials in ascending (kp, seq) order
      (deterministic float accumulation) → sqrt → write
      ``norms/salt=*/`` parquet.

    idf here is the *integer-division* variant (Indexer.java:766) — see
    functions/vsm.py. Output: ``norms/`` directory, returned.
    """
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ..functions.vsm import idf_int
    from ..stages.codec import all_tfs, decode_all_docs, skips_from_bytes

    meta = load_meta(index_dir)
    n_docs = int(meta["n_docs"])
    term_parts = int(meta["term_parts"])
    salt_bits = int(meta["salt_bits"])
    part_root = os.path.join(index_dir, "partitions")

    # prefer the compacted layout when present: one merged run per term
    # per gkey instead of one per build partition — decode work per
    # norm pass drops from O(P·df) to O(df) on multi-partition indexes
    comp_seg = os.path.join(index_dir, "compacted", "segments")
    if os.path.isdir(comp_seg):
        seg_dirs = [comp_seg]
    else:
        seg_dirs = [
            os.path.join(part_root, pdir, "segments")
            for pdir in sorted(os.listdir(part_root))
        ]

    files_by_kp: dict[int, list[str]] = {kp: [] for kp in range(term_parts)}
    for seg_dir in seg_dirs:
        if not os.path.isdir(seg_dir):
            continue
        for fname in sorted(os.listdir(seg_dir)):
            if fname.endswith(".parquet"):
                gkey = int(fname[4:-8])
                files_by_kp[gkey % term_parts].append(os.path.join(seg_dir, fname))

    items = [
        {"kp": kp, "files": files} for kp, files in files_by_kp.items() if files
    ]

    def w2_partials(batch: dict) -> pa.Table:
        out_ids: list[np.ndarray] = []
        out_w2: list[np.ndarray] = []
        out_kp: list[np.ndarray] = []
        out_seq: list[np.ndarray] = []
        for kp, files in zip(batch["kp"], batch["files"]):
            tabs = [pq.read_table(f, columns=["term", "df", "docs", "tfs", "skips"]) for f in files]
            df_global: dict[str, int] = {}
            for tab in tabs:
                for term, df in zip(tab["term"].to_pylist(), tab["df"].to_pylist()):
                    df_global[term] = df_global.get(term, 0) + int(df)
            # flush one partial per FILE (seq column keeps downstream
            # accumulation deterministic) so worker memory stays bounded
            # by one segment file's doc set, not the whole term-part
            for seq, tab in enumerate(tabs):
                terms = tab["term"].to_pylist()
                id_chunks, w2_chunks = [], []
                for row in range(tab.num_rows):
                    t_idf = idf_int(n_docs, df_global[terms[row]])
                    skips = skips_from_bytes(tab["skips"][row].as_buffer())
                    ids = decode_all_docs(tab["docs"][row].as_buffer(), skips)
                    if ids.size == 0:
                        continue
                    w = all_tfs(tab["tfs"][row].as_buffer()) * t_idf
                    id_chunks.append(ids)
                    w2_chunks.append(w * w)
                if not id_chunks:
                    continue
                ids_all = np.concatenate(id_chunks)
                w2_all = np.concatenate(w2_chunks)
                uniq, inv = np.unique(ids_all, return_inverse=True)
                sums = np.zeros(uniq.size, np.float64)
                np.add.at(sums, inv, w2_all)
                out_ids.append(uniq)
                out_w2.append(sums)
                out_kp.append(np.full(uniq.size, int(kp), np.int32))
                out_seq.append(np.full(uniq.size, seq, np.int32))
        if not out_ids:
            return pa.Table.from_pydict(
                {
                    "dgrp": pa.array([], pa.int32()),
                    "doc_id": pa.array([], pa.int64()),
                    "kp": pa.array([], pa.int32()),
                    "seq": pa.array([], pa.int32()),
                    "w2": pa.array([], pa.float64()),
                }
            )
        ids_cat = np.concatenate(out_ids).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "dgrp": pa.array((ids_cat % _NORM_GROUPS).astype(np.int32)),
                "doc_id": pa.array(ids_cat),
                "kp": pa.array(np.concatenate(out_kp)),
                "seq": pa.array(np.concatenate(out_seq)),
                "w2": pa.array(np.concatenate(out_w2)),
            }
        )

    def norm_group(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        kp = group["kp"].to_numpy()
        seq = group["seq"].to_numpy()
        w2 = group["w2"].to_numpy()
        uniq = np.unique(ids)
        # ascending (kp, seq) accumulation per doc: deterministic sums
        order = np.lexsort((seq, kp, ids))
        acc = np.zeros(uniq.size, np.float64)
        np.add.at(acc, np.searchsorted(uniq, ids[order]), w2[order])
        norms = np.sqrt(acc)
        salts = (uniq.astype(np.uint64) >> np.uint64(63 - salt_bits)).astype(np.int32)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(uniq.astype(np.int64)),
                "norm": pa.array(norms),
                "salt": pa.array(salts),
            }
        )

    out_dir = os.path.join(index_dir, "norms")
    tmp_dir = out_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp_dir, ignore_errors=True)
    if items:
        (
            rd.from_items(items)
            .map_batches(w2_partials, batch_size=1)  # one task per term part
            .groupby("dgrp")
            .map_groups(norm_group, batch_format="pyarrow")
            .write_parquet(tmp_dir, partition_cols=["salt"])
        )
    else:  # zero postings → empty (but present) norms directory
        os.makedirs(tmp_dir, exist_ok=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp_dir, out_dir)
    return out_dir
