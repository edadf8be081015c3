"""Deterministic resumable corpus shuffle (training-data export).

Training runs need the corpus in a reproducible pseudo-random order —
re-runnable after a crash, identical across cluster sizes and engines.
The scale shape used here:

* **shuffle key** = ``md5(doc_id || ':' || seed)`` — a pure function of
  the row (the same rule :func:`..pipelines.sampling.stratified_sample`
  uses), so the order needs NO RNG state, no coordination, and a DuckDB
  oracle can re-derive it;
* **prefix-range sharding**: the key's leading hex chars pick one of
  ``num_shards`` contiguous key ranges, so the GLOBAL shuffled order is
  just shard 0..N-1 concatenated, each shard sorted by key — no global
  sort barrier, no sample-based range partitioning; every shard is one
  independent bounded task. The prefix WIDTH scales with the shard
  count: ≤256 shards use the first key byte (``shard = byte0·N/256``),
  larger counts the first two (``shard = (byte0·256+byte1)·N/65536``,
  up to 65536 shards) — so "size num_shards to the target file size"
  holds at 100 TB (65536 shards ≈ 1.5 GB each), and each shard still
  fits the one-reducer sort-and-write task that makes resume atomic;
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

_PREFIX_SPACE_1 = 256  # one key byte (two hex chars)
_PREFIX_SPACE_2 = 65536  # two key bytes (four hex chars)
_MAX_SHARDS = _PREFIX_SPACE_2


def _prefix_space(num_shards: int) -> int:
    """Smallest supported prefix space that can address every shard.
    ≤256 shards keep the historical one-byte rule (``byte0·N/256`` —
    what the SQL oracles and all existing manifests encode); beyond
    that the space widens to two bytes. For N ≤ 256 the two rules
    agree anyway whenever 256 % N == 0, but pinning the one-byte rule
    keeps EVERY small-N assignment stable across this change."""
    return _PREFIX_SPACE_1 if num_shards <= _PREFIX_SPACE_1 else _PREFIX_SPACE_2


def _validate_num_shards(num_shards: int) -> None:
    """num_shards is capped by the widest prefix space (4 hex chars):
    beyond 65536 the extra shards would be PERMANENTLY empty, silently
    breaking the 'size num_shards to the target file size' contract —
    rejected instead. Public entry points validate up front so a bad
    export fails before any manifest or shard is written, not
    mid-shuffle."""
    if not 1 <= num_shards <= _MAX_SHARDS:
        raise ValueError(
            f"num_shards must be in [1, {_MAX_SHARDS}] (shards are "
            f"key-prefix ranges, ≤4 hex chars); got {num_shards}"
        )


def _key_digest(doc_id: int, sfx: bytes) -> bytes:
    """md5 digest of "<doc_id>:<seed>" — THE one key rule.
    _shuffle_key (scalar consumers: curate, oracles) delegates here;
    _assign_keys (the batch hot path) inlines the same expression to
    skip 10M+ function calls and GUARDS the inlining with a per-chunk
    runtime assertion against this function, so the two can never
    silently diverge; the module invariant `global order == shard
    files concatenated` depends on every consumer agreeing
    byte-for-byte."""
    return hashlib.md5(b"%d" % doc_id + sfx).digest()


def _shuffle_key(doc_id: int, seed: int) -> str:
    return _key_digest(doc_id, f":{seed}".encode()).hex()


# keep per-chunk hex buffers under int32 StringArray offsets
# (32 bytes/key ⇒ 16M keys ≈ 512 MB < 2^31)
_KEY_CHUNK = 16_000_000


def _assign_keys(ids, seed: int, num_shards: int):
    """(keys, shards) for a doc_id sequence — THE sharding rule. Every
    consumer (manifest, export, packing) must derive shards from this
    one function: the module invariant `global order == shard files
    concatenated` holds only while they agree.

    Returns ``(pa.Array[string], np.ndarray[int64])``. One md5 per row
    is irreducible (the key rule), but everything around it is
    vectorized: digests are joined into one buffer, ``binascii.hexlify``
    produces all hex keys in one C pass, the Arrow string column is
    built zero-copy via ``StringArray.from_buffers``, and the shard is
    the leading digest byte(s) sliced straight out of the joined buffer
    (byte0 IS ``int(key[:2], 16)`` — no second parse loop; >256 shards
    also slice byte1, see :func:`_prefix_space`)."""
    import binascii

    _validate_num_shards(num_shards)
    space = _prefix_space(num_shards)
    md5 = hashlib.md5
    sfx = f":{seed}".encode()
    key_chunks = []
    prefix_chunks = []
    ids = list(ids)
    for lo in range(0, len(ids), _KEY_CHUNK):
        chunk = ids[lo : lo + _KEY_CHUNK]
        buf = b"".join(md5(b"%d" % i + sfx).digest() for i in chunk)
        # the inlined expression above must stay byte-identical to the
        # scalar key rule (curate + SQL oracles go through _key_digest)
        assert buf[:16] == _key_digest(chunk[0], sfx)
        raw = np.frombuffer(buf, dtype=np.uint8)
        prefix = raw[::16].astype(np.int64)
        if space == _PREFIX_SPACE_2:
            prefix = prefix * 256 + raw[1::16]
        prefix_chunks.append(prefix)
        offs = np.arange(0, 32 * (len(chunk) + 1), 32, dtype=np.int32)
        key_chunks.append(
            pa.StringArray.from_buffers(
                len(chunk),
                pa.py_buffer(offs.tobytes()),
                pa.py_buffer(binascii.hexlify(buf)),
            )
        )
    if not ids:
        return pa.array([], pa.string()), np.zeros(0, np.int64)
    # NEVER combine_chunks here: concatenating >~67M 32-char keys
    # overflows int32 StringArray offsets — the exact limit the
    # chunking avoids. ChunkedArray flows through filter /
    # Table.from_arrays / from_pydict unchanged.
    keys = (
        key_chunks[0]
        if len(key_chunks) == 1
        else pa.chunked_array(key_chunks)
    )
    shards = np.concatenate(prefix_chunks) * num_shards // space
    return keys, shards


def shuffle_manifest(sf_dir: str, seed: int = 0, num_shards: int = 16):
    """(doc_id, shuffle_key, shard) for every document — the shuffle
    assignment, deterministic and SQL-oracle-checkable. Global shuffled
    order = ORDER BY (shard, shuffle_key) = ORDER BY shuffle_key (the
    shard is a key-prefix range)."""
    import ray.data as rd

    def assign(batch: pa.Table) -> pa.Table:
        keys, shards = _assign_keys(batch["doc_id"].to_pylist(), seed, num_shards)
        return pa.Table.from_arrays(
            [batch["doc_id"], keys, pa.array(shards)],
            names=["doc_id", "shuffle_key", "shard"],
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def shuffle_export(
    sf_dir: str,
    out_dir: str,
    seed: int = 0,
    num_shards: int = 16,
    keep_ids: "np.ndarray | None" = None,
    split: "tuple[str, dict, int] | None" = None,
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
    complete shards and reproduces the rest byte-identically — the
    (seed, num_shards, keep-set digest) are pinned in a manifest, and
    a resume with different parameters refuses.

    ``keep_ids`` (optional): export only these doc_ids (e.g. the
    curated set) — a sorted broadcastable array, filtered in the same
    single pass. For corpus-sized keeps use ``split`` instead: a
    ``(name, fractions, split_seed)`` triple selecting one
    :func:`..pipelines.sampling.dataset_split` split by its PURE-ROW
    hash-range rule — filtered in the same pass with nothing
    materialized anywhere (the scale path for exporting a shuffled
    train split: an id list of the majority split would be
    corpus-sized). Returns {shards_written, shards_skipped, rows,
    out_dir}."""
    import json

    import ray.data as rd

    _validate_num_shards(num_shards)
    os.makedirs(out_dir, exist_ok=True)
    # resume is only valid against the SAME (seed, num_shards): shard
    # files carry no parameters, so an unvalidated resume after a
    # parameter change would silently keep stale files in the "global"
    # order. A manifest written before any shard pins the parameters.
    keep_sorted = None
    keep_digest = None
    if keep_ids is not None:
        keep_sorted = np.unique(np.asarray(keep_ids, np.int64))
        keep_digest = hashlib.md5(keep_sorted.tobytes()).hexdigest()
    # resolve the split selection to an integer hash range (lo, hi]:
    # pure plan-time math, pinned verbatim in the manifest
    split_range = None
    split_offset = None
    if split is not None:
        from .sampling import _GOLDEN, _U64, split_boundaries

        name, fractions, split_seed = split
        bounds = split_boundaries(fractions)
        names = [n for n, _ in bounds]
        if name not in names:
            raise ValueError(f"split {name!r} not in {names}")
        i = names.index(name)
        lo = -1 if i == 0 else bounds[i - 1][1]
        split_range = (int(lo), int(bounds[i][1]))
        split_offset = (int(split_seed) * _GOLDEN) % _U64
    manifest_path = os.path.join(out_dir, "shuffle_manifest.json")
    params = {
        "format": "shuffle-prefix-shards-v1",
        "seed": int(seed),
        "num_shards": int(num_shards),
        "keep_digest": keep_digest,
        "split_range": list(split_range) if split_range else None,
        "split_offset": split_offset,
    }
    if os.path.isfile(manifest_path):
        with open(manifest_path) as f:
            existing = json.load(f)
        # manifests written before keep_digest/split existed mean
        # "unfiltered"
        existing.setdefault("keep_digest", None)
        existing.setdefault("split_range", None)
        existing.setdefault("split_offset", None)
        if existing != params:
            raise ValueError(
                f"out_dir {out_dir!r} holds a shuffle with parameters "
                f"{existing}; refusing to resume with {params} — use a "
                "fresh directory"
            )
    elif any(f.endswith(".parquet") for f in os.listdir(out_dir)):
        raise ValueError(
            f"out_dir {out_dir!r} contains parquet files but no shuffle "
            "manifest; refusing to mix output with unknown files"
        )
    else:
        with open(manifest_path + ".tmp", "w") as f:
            json.dump(params, f)
        os.replace(manifest_path + ".tmp", manifest_path)

    done = {
        s
        for s in range(num_shards)
        if os.path.isfile(os.path.join(out_dir, f"shard-{s:05d}.parquet"))
    }

    keep_ref = None
    if keep_sorted is not None:
        import ray

        keep_ref = ray.put(keep_sorted)  # broadcast once, not per task

    # vectorized resume filter: a bool LUT indexed by shard beats a
    # per-row set probe (num_shards entries, broadcast in the closure)
    pending_mask = np.ones(num_shards, bool)
    pending_mask[list(done)] = False

    def assign_full(batch: pa.Table) -> pa.Table:
        keys, shards = _assign_keys(batch["doc_id"].to_pylist(), seed, num_shards)
        keep = pending_mask[shards]
        if split_range is not None:
            from .similarity import _splitmix64

            with np.errstate(over="ignore"):
                h = _splitmix64(
                    batch["doc_id"].to_numpy().astype(np.uint64)
                    + np.uint64(split_offset)
                )
            lo, hi = split_range
            # lo is -1 for the first split: every u64 h is > lo then
            keep &= (h <= np.uint64(hi)) & (
                h > np.uint64(lo) if lo >= 0 else True
            )
        if keep_ref is not None:
            import ray

            from .dedup import _in_sorted

            keep &= _in_sorted(
                ray.get(keep_ref), batch["doc_id"].to_numpy().astype(np.int64)
            )
        mask = pa.array(keep)
        out = batch.filter(mask)
        out = out.append_column("shuffle_key", keys.filter(mask))
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
        # a shard with zero rows (routine under keep_ids) never reaches
        # its group: write it empty so resume bookkeeping stays by-file,
        # and count it as written so written + skipped == num_shards
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
                written += 1

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


def pack_offsets(sf_dir: str, seed: int = 0, num_shards: int = 16, seq_len: int = 512):
    """Sequence-packing assignment (LLM-pretraining pack-and-split):
    conceptually concatenate every document's tokens in the
    deterministic shuffled order and cut the stream every ``seq_len``
    tokens; report where each document lands. Returns per doc:
    (doc_id, n_tokens, start_offset, start_seq, end_seq) — empty docs
    get end_seq = start_seq.

    Distributed as the classic PREFIX SCAN: token counts are computed
    in the same single pass that assigns shuffle keys; per-shard token
    totals (``num_shards`` tiny rows) come back to the driver for an
    exclusive scan in shard order; each shard's group task then adds
    its broadcast base to a vectorized intra-shard cumsum over the
    key-sorted rows. Shard order concatenated = global shuffle order
    (key-prefix ranges), so offsets are globally exact with one bounded
    all-to-all and a 16-row driver step — no global sort, no sequential
    pass over the corpus anywhere.

    Tokenization = ``[a-z0-9]+`` runs of the lowered text (the
    dedup/oracle convention), so the DuckDB oracle is one window
    function over the same counts.
    """
    import ray
    import ray.data as rd

    from ..stages.tokenize import token_codes_batch

    def assign_counts(batch: pa.Table) -> pa.Table:
        keys, shards = _assign_keys(batch["doc_id"].to_pylist(), seed, num_shards)
        uniq, codes, lens, n = token_codes_batch(
            batch["text"], lower_first=True
        )
        real = np.fromiter((bool(t) for t in uniq), bool, len(uniq))
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        if len(uniq):
            n_tok = np.bincount(doc_of[real[codes]], minlength=n)
        else:
            n_tok = np.zeros(n, np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "shuffle_key": keys,
                "shard": shards,
                "n_tokens": n_tok.astype(np.int64),
            }
        )

    assigned = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(assign_counts, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    from ray.data.aggregate import Sum

    totals = (
        assigned.groupby("shard")
        .aggregate(Sum("n_tokens", alias_name="total"))
        .to_pandas()  # <= num_shards rows
        .set_index("shard")["total"]
    )
    bases = {}
    acc = 0
    for s in range(num_shards):  # exclusive scan in shard (= key) order
        bases[s] = acc
        acc += int(totals.get(s, 0))
    bases_ref = ray.put(bases)

    def emit(group: pa.Table) -> pa.Table:
        import ray as _ray

        base = _ray.get(bases_ref)[int(group["shard"][0].as_py())]
        order = pa.compute.sort_indices(group["shuffle_key"])
        g = group.take(order)
        n_tok = g["n_tokens"].to_numpy()
        start = base + np.concatenate(([0], np.cumsum(n_tok)[:-1]))
        end_tok = start + np.maximum(n_tok, 1) - 1  # empty doc: start_seq
        return pa.Table.from_pydict(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_tokens": n_tok,
                "start_offset": start.astype(np.int64),
                "start_seq": (start // seq_len).astype(np.int64),
                "end_seq": (end_tok // seq_len).astype(np.int64),
            }
        )

    return assigned.groupby("shard").map_groups(emit, batch_format="pyarrow")


def export_jsonl(
    shard_dir: str,
    out_dir: str,
    columns: "list[str] | None" = None,
    compression: "str | None" = None,
) -> dict:
    """Convert a :func:`shuffle_export` output directory to JSONL —
    the trainer hand-off format symmetric with ``sources/ingest``'s
    JSONL reader. One output file per input shard, SAME name stem and
    row order (so reading shard 0..N-1 in order still yields the
    global shuffle), written atomically and resumable by file:
    re-running converts only the missing shards.

    ``compression``: None or ``"gzip"`` (→ ``.jsonl.gz``; gzip mtime
    pinned to 0 so reruns are byte-identical). The ``shuffle_key``
    bookkeeping column is dropped unless explicitly listed in
    ``columns``. Row serialization is pandas' C ``to_json`` (no
    per-row Python). Returns {files_written, files_skipped, rows}.
    """
    import gzip

    import ray.data as rd

    if compression not in (None, "gzip"):
        raise ValueError(f"unsupported compression: {compression!r}")
    os.makedirs(out_dir, exist_ok=True)
    shards = sorted(
        f for f in os.listdir(shard_dir) if f.endswith(".parquet")
    )
    if not shards:
        raise ValueError(f"no parquet shards under {shard_dir!r}")
    ext = ".jsonl.gz" if compression else ".jsonl"

    def convert(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out_rows = []
        for name in batch["file"].to_pylist():
            stem = name[: -len(".parquet")]
            path = os.path.join(out_dir, stem + ext)
            if os.path.isfile(path):
                out_rows.append((name, -1))
                continue
            tab = pq.read_table(os.path.join(shard_dir, name), columns=columns)
            if columns is None and "shuffle_key" in tab.column_names:
                tab = tab.drop_columns(["shuffle_key"])
            body = tab.to_pandas().to_json(
                orient="records", lines=True, force_ascii=False
            )
            # exactly one newline per record (pandas' trailing-newline
            # behavior varies by version)
            body = body.rstrip("\n")
            data = (body + "\n").encode() if body else b""
            tmp = path + ".tmp"
            if compression:
                with open(tmp, "wb") as f:
                    with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
                        gz.write(data)
            else:
                with open(tmp, "wb") as f:
                    f.write(data)
            os.replace(tmp, path)
            out_rows.append((name, tab.num_rows))
        return pa.Table.from_pydict(
            {
                "file": pa.array([r[0] for r in out_rows], pa.string()),
                "rows": pa.array([r[1] for r in out_rows], pa.int64()),
            }
        )

    stats = (
        rd.from_items([{"file": f} for f in shards])
        .repartition(len(shards))
        .map_batches(convert, batch_format="pyarrow")
        .to_pandas()
    )
    skipped = int((stats["rows"] < 0).sum())
    return {
        "files_written": len(stats) - skipped,
        "files_skipped": skipped,
        "rows": int(stats.loc[stats["rows"] >= 0, "rows"].sum()),
    }
