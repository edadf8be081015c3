"""Sampling + distribution-summary operators (training-data pipelines).

* :func:`stratified_sample` — DETERMINISTIC Bernoulli sampling by
  content hash: a row is kept iff the first 4 hex digits of
  ``md5(str(doc_id))`` compare ``<=`` a threshold string. Every stratum
  (``source``, ``lang``, …) is sampled at the same rate with zero
  coordination — no shuffle, no RNG state, reproducible across runs,
  cluster sizes and engines (the same rule is one SQL ``WHERE`` clause,
  which is the DuckDB oracle). This is how a 100 TB pipeline samples:
  the decision is a pure function of the row.
* :func:`group_quantiles` — exact per-group quantiles of a numeric
  column. Interpolation follows the SQL ``quantile_cont`` definition
  (``X[l] + (rn - l) * (X[u] - X[l])`` on the sorted values) so the
  DuckDB oracle matches value-for-value. The groupby moves (group,
  value) pairs only — at extreme cardinality swap in a mergeable sketch
  (see pipelines/sketches.py for the pattern).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.rounding import round_half_up


def _md5_prefix4(x: int) -> str:
    return hashlib.md5(str(x).encode()).hexdigest()[:4]


def md5_prefix4_le(ids, threshold_hex: str) -> "np.ndarray":
    """Vectorized ``md5(str(id))[:4] <= threshold_hex`` for an id
    sequence — THE held-out/sample membership rule (shared by
    stratified_sample, decontaminate and curate). One md5 per row is
    irreducible; everything else is batch work: digests join into one
    buffer and the 4-hex-char prefix compare is the first two digest
    bytes as a big-endian uint16 against ``int(threshold_hex, 16)``
    (hex strings compare lexicographically iff their values compare,
    at equal length). Guarded per call against the scalar rule so the
    two can never silently diverge."""
    if len(threshold_hex) != 4 or any(
        c not in "0123456789abcdef" for c in threshold_hex
    ):
        # the scalar rule is a STRING compare vs the lowercase
        # hexdigest; only a 4-char lowercase threshold makes that
        # equivalent to the numeric fast path below. Other thresholds
        # stay DEFINED (the public entry points always accepted them)
        # via the scalar rule itself
        return np.asarray(
            [_md5_prefix4(int(i)) <= threshold_hex for i in ids], bool
        )
    ids = list(ids)
    if not ids:
        return np.zeros(0, bool)
    md5 = hashlib.md5
    buf = b"".join(md5(str(i).encode()).digest() for i in ids)
    b = np.frombuffer(buf, np.uint8)
    prefix = (
        b[::16].astype(np.uint32) * 256 + b[1::16].astype(np.uint32)
    )
    out = prefix <= int(threshold_hex, 16)
    assert bool(out[0]) == (_md5_prefix4(ids[0]) <= threshold_hex)
    return out


def stratified_sample(sf_dir: str, threshold_hex: str = "1999"):
    """Rows of ``documents`` kept iff md5(doc_id)[:4] <= threshold_hex
    (~fraction int(threshold_hex, 16)/65535; '1999' ≈ 10%). Returns
    (doc_id, source, lang)."""
    import ray.data as rd

    def keep(batch: pa.Table) -> pa.Table:
        mask = md5_prefix4_le(batch["doc_id"].to_pylist(), threshold_hex)
        return batch.filter(pa.array(mask))

    return (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "lang"]
        )
        .map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    )


def sample_exact_k(sf_dir: str, k: int = 200):
    """Exactly ``k`` documents sampled uniformly and DETERMINISTICALLY:
    the ``k`` rows with the smallest ``md5(CAST(doc_id AS VARCHAR))``
    (ties — impossible in practice — broken by doc_id ascending).
    Output: (doc_id, sample_key). The distributed equivalent of
    reservoir sampling, reproducible across cluster sizes and reruns:
    a bottom-k order statistic is a semilattice, so each batch reduces
    to AT MOST ``k`` candidate rows (the same partial-combiner contract
    as :func:`top_per_source`) and the final pass ranks a bounded
    ``k × blocks`` candidate set in one group. Growing the corpus only
    *replaces* sampled rows, never rescans them."""
    import ray.data as rd

    from .dedup import md5_hex_array

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        keys = md5_hex_array([str(i) for i in ids.tolist()])
        order = np.lexsort((ids, np.asarray(keys, dtype=object)))[:k]
        order.sort()  # keep input order within the batch (cosmetic)
        t = pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), keys], names=["doc_id", "sample_key"]
        ).take(pa.array(order))
        return t.append_column("g", pa.array(np.zeros(len(t), np.int8)))

    def final(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy().astype(np.int64)
        keys = np.asarray(group["sample_key"].to_pylist(), dtype=object)
        order = np.lexsort((ids, keys))[:k]
        return pa.Table.from_arrays(
            [
                pa.array(ids[order], pa.int64()),
                pa.array(keys[order].tolist(), pa.string()),
            ],
            names=["doc_id", "sample_key"],
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .map_groups(final, batch_format="pyarrow")
        .select_columns(["doc_id", "sample_key"])
    )


def sample_per_source(sf_dir: str, k: int = 10):
    """Stratified exactly-``k`` sample: the ``k`` rows with the
    smallest ``md5(doc_id)`` keys WITHIN EACH SOURCE (fewer if a source
    has fewer rows) — :func:`sample_exact_k`'s bottom-k order statistic
    applied group-wise, the deterministic equivalent of per-stratum
    reservoir sampling. Output: (source, doc_id, sample_key).

    Same two-level shape as :func:`top_per_source`: each batch reduces
    to ≤ k rows per source it contains (one lexsort + running
    group-start rank), so the ``groupby(source)`` exchange moves
    ``k × blocks`` rows per source and the final per-source pass ranks
    a bounded candidate set. NULL sources sample under ``""``."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .dedup import md5_hex_array

    def _bottomk(src_codes, keys, ids, n):
        order = np.lexsort((ids, keys, src_codes))
        sc = src_codes[order]
        first = np.ones(sc.size, bool)
        if sc.size:
            first[1:] = sc[1:] != sc[:-1]
        seg = np.flatnonzero(first)[np.cumsum(first) - 1]
        rank = np.arange(sc.size) - seg
        return order[rank < n]

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        keys = np.asarray(
            md5_hex_array([str(i) for i in ids.tolist()]), dtype=object
        )
        src = pc.fill_null(batch["source"], "")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        codes = (
            src.dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = _bottomk(codes, keys, ids, k)
        return pa.Table.from_arrays(
            [
                src.take(pa.array(keep)),
                pa.array(ids[keep], pa.int64()),
                pa.array(keys[keep].tolist(), pa.string()),
            ],
            names=["source", "doc_id", "sample_key"],
        )

    def final(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy().astype(np.int64)
        keys = np.asarray(group["sample_key"].to_pylist(), dtype=object)
        keep = _bottomk(np.zeros(ids.size, np.int64), keys, ids, k)
        src = group["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        return pa.Table.from_arrays(
            [
                src.take(pa.array(keep)),
                pa.array(ids[keep], pa.int64()),
                pa.array(keys[keep].tolist(), pa.string()),
            ],
            names=["source", "doc_id", "sample_key"],
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .map_groups(final, batch_format="pyarrow")
    )


def _quantile_cont(sorted_vals: np.ndarray, q: float) -> float:
    """SQL quantile_cont: X[l] + (rn - l)·(X[u] - X[l]) over sorted
    values — DuckDB's exact op order, for oracle value-equality."""
    n = sorted_vals.size
    if n == 1:
        return float(sorted_vals[0])
    rn = (n - 1) * q
    lo = int(np.floor(rn))
    hi = int(np.ceil(rn))
    x_lo = float(sorted_vals[lo])
    x_hi = float(sorted_vals[hi])
    return x_lo + (rn - lo) * (x_hi - x_lo)


QUANTILES = (0.25, 0.5, 0.75, 0.9)


def group_quantiles(sf_dir: str):
    """Per event_type: count + exact q25/q50/q75/q90 of ``value``
    (rounded to 6), quantile_cont semantics."""
    import ray.data as rd

    def qrows(group: pa.Table) -> pa.Table:
        vals = np.sort(group["value"].to_numpy().astype(np.float64))
        row = {"event_type": [group["event_type"][0].as_py()], "n": [len(vals)]}
        for q in QUANTILES:
            row[f"q{int(q * 100)}"] = [
                float(round_half_up(np.float64(_quantile_cont(vals, q)), 6))
            ]
        return pa.Table.from_pydict(row)

    return (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        .groupby("event_type")
        .map_groups(qrows, batch_format="pyarrow")
    )


def latest_n_per_user(sf_dir: str, n: int = 5):
    """Per-group example capping — keep each user's latest ``n`` events
    (the standard "at most N examples per source/user" training-data
    rule). Returns (user_id, event_id, ts_s, rn), rn = 0 for the
    newest; ties on ts broken by event_id desc.

    Scale shape: rows shuffle into ~64 COARSE shards by user hash (one
    vectorized Python call per shard, not per user — the same pattern
    as the dedup candidate emission); inside a shard one lexsort by
    (user, ts desc, id desc) and a run-relative ``arange`` give every
    row its per-user rank with no per-group loop. A user's rows always
    land in one shard, so correctness is shard-count independent.
    """
    import ray.data as rd

    _NS = 64

    def add_shard(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy()
        return pa.Table.from_pydict(
            {
                "shard": (uid % _NS).astype(np.int32),
                "user_id": uid,
                "event_id": batch["event_id"].to_numpy(),
                "tus": batch["ts"].cast(pa.int64()).to_numpy(),
            }
        )

    def rank_shard(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy()
        eid = group["event_id"].to_numpy()
        tus = group["tus"].to_numpy()
        order = np.lexsort((-eid, -tus, uid))
        uid, eid, tus = uid[order], eid[order], tus[order]
        new = np.ones(uid.size, bool)
        new[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, uid.size))
        rn = np.arange(uid.size) - np.repeat(starts, counts)
        keep = rn < n
        return pa.Table.from_pydict(
            {
                "user_id": uid[keep],
                "event_id": eid[keep],
                "ts_s": tus[keep] // 1_000_000,
                "rn": rn[keep].astype(np.int64),
            }
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
        )
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(rank_shard, batch_format="pyarrow")
    )


def group_quantiles_hist(sf_dir: str, bins: int = 2048):
    """Approximate per-group quantiles with a PROVABLE value bound —
    the mergeable-sketch swap :func:`group_quantiles` documents for
    extreme-cardinality groups.

    Two cheap passes instead of shuffling every (group, value) pair:

    1. per-group ``Min``/``Max`` (a scalar aggregate), broadcast;
    2. per-batch fixed-bin histograms over ``[min, max]`` emitted as
       sparse (group, bin, count) rows, merged by ``groupby.sum`` —
       counts are sum-mergeable, so shuffle volume is capped at
       ``#batches × groups × bins`` regardless of row count.

    A quantile is answered from the merged histogram by estimating the
    TWO order statistics ``X[floor(rn)]`` / ``X[ceil(rn)]`` that
    ``quantile_cont`` interpolates between — each located via the
    cumulative counts and estimated inside its landing bin — and then
    interpolating those estimates with the same fraction. Each order
    statistic and its estimate lie in the same bin, so each is off by
    at most one bin width; a convex combination of the two keeps
    ``|est - exact| <= (max - min) / bins`` (asserted, including an
    adversarial empty-bin-gap distribution, in tests/test_sampling.py;
    interpolating only inside the landing bin of the fractional rank —
    the naive estimator — has NO such bound: when the two straddling
    ranks sit on opposite sides of a run of empty bins the exact value
    interpolates across the gap, with error up to ~(max-min)/2).
    Output schema matches :func:`group_quantiles` (q25/q50/q75/q90,
    rounded to 6).
    """
    import pandas as pd
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    src = lambda cols: rd.read_parquet(  # noqa: E731
        f"{sf_dir}/events.parquet", columns=cols
    )

    ranges = (
        src(["event_type", "value"])
        .groupby("event_type")
        .aggregate(Min("value", alias_name="lo"), Max("value", alias_name="hi"))
        .to_pandas()  # one row per group
    )
    lohi = {
        r.event_type: (float(r.lo), float(r.hi)) for r in ranges.itertuples()
    }
    lohi_ref = ray.put(lohi)

    def hist_rows(batch: pa.Table) -> pa.Table:
        # Whole-batch vectorized: dictionary-encode the group column
        # (Python touches only the few UNIQUE groups for the lo/hi
        # lookup), broadcast each row's range via the codes, one bin
        # computation + one bincount over a combined (code, bin) key.
        rng = ray.get(lohi_ref)
        if batch.num_rows == 0:
            return pa.Table.from_pydict(
                {"event_type": [], "bin": [], "cnt": []},
                pa.schema(
                    [("event_type", pa.string()), ("bin", pa.int64()), ("cnt", pa.int64())]
                ),
            )
        enc = batch["event_type"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        cats = enc.dictionary.to_pylist()
        los = np.asarray([rng[g][0] for g in cats], np.float64)
        his = np.asarray([rng[g][1] for g in cats], np.float64)
        vs = batch["value"].to_numpy().astype(np.float64)
        lo_r, hi_r = los[codes], his[codes]
        span = hi_r - lo_r
        b = np.zeros(vs.size, np.int64)
        m = span > 0.0
        # same elementwise IEEE ops as the per-group formula
        b[m] = np.clip(
            ((vs[m] - lo_r[m]) / span[m] * bins).astype(np.int64), 0, bins - 1
        )
        key = codes * bins + b
        counts = np.bincount(key, minlength=len(cats) * bins)
        nz = np.flatnonzero(counts)
        return pa.Table.from_pydict(
            {
                "event_type": pa.array(
                    np.asarray(cats, object)[nz // bins], pa.string()
                ),
                "bin": nz % bins,
                "cnt": counts[nz],
            }
        )

    merged = (
        src(["event_type", "value"])
        .map_batches(hist_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "bin"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # <= groups x bins rows
    )

    rows = []
    for g, sub in merged.groupby("event_type"):
        lo, hi = lohi[g]
        width = (hi - lo) / bins if hi > lo else 0.0
        sub = sub.sort_values("bin")
        b = sub["bin"].to_numpy()
        c = sub["cnt"].to_numpy().astype(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        def order_stat_est(r: int) -> float:
            # bin j holds the 0-indexed order statistic X[r]:
            # cum[j-1] <= r < cum[j]
            j = min(int(np.searchsorted(cum, r, side="right")), b.size - 1)
            before = int(cum[j - 1]) if j > 0 else 0
            inbin = int(c[j])
            pos = (r - before + 0.5) / inbin if inbin else 0.5
            return lo + (b[j] + pos) * width  # inside X[r]'s bin

        row = {"event_type": g, "n": n}
        for q in QUANTILES:
            rn = (n - 1) * q  # quantile_cont rank
            r_lo = int(np.floor(rn))
            r_hi = int(np.ceil(rn))
            e_lo = order_stat_est(r_lo)
            e_hi = e_lo if r_hi == r_lo else order_stat_est(r_hi)
            est = e_lo + (rn - r_lo) * (e_hi - e_lo)
            row[f"q{int(q * 100)}"] = float(round_half_up(np.float64(est), 6))
        rows.append(row)
    return pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)


_GOLDEN = 0x9E3779B97F4A7C15
_U64 = 1 << 64


def split_boundaries(fractions: "dict[str, float]") -> "list[tuple[str, int]]":
    """Ordered (split, upper_boundary) pairs for a deterministic
    train/val/test split: a doc lands in the FIRST split whose boundary
    is >= its hash. Boundaries are cumulative-fraction integers on the
    u64 line, computed ONCE at plan time and shared verbatim with the
    SQL oracle (the mixing.sample_threshold rule — no float ambiguity
    at a split edge). The last boundary is forced to 2^64-1 so every
    document lands somewhere even if the fractions sum slightly under
    1.0; fractions must be positive and sum to <= 1 + 1e-9."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    if any(f <= 0.0 for f in fractions.values()):
        raise ValueError(f"fractions must be positive: {fractions}")
    if sum(fractions.values()) > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to > 1: {fractions}")
    out = []
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        b = min(int(cum * 2.0**64) - 1, _U64 - 1)
        if b < 0 or (out and b <= out[-1][1]):
            # a fraction below ~2^-64 yields boundary -1 (which wraps
            # under uint64 and lets the split swallow everything) or a
            # non-advancing boundary (an unreachable split): reject
            raise ValueError(
                f"fraction {frac!r} for split {name!r} is too small to "
                "occupy any of the u64 hash line"
            )
        out.append((name, b))
    out[-1] = (out[-1][0], _U64 - 1)
    return out


def dataset_split(
    sf_dir: str,
    fractions: "dict[str, float] | None" = None,
    seed: int = 0,
):
    """Deterministic train/val/test assignment: split of a document is
    a PURE FUNCTION of (doc_id, seed) — ``splitmix64(doc_id + seed ·
    golden)`` against the cumulative-fraction boundaries — so the split
    needs no RNG state, is identical across cluster sizes / re-runs /
    engines, membership of any doc can be answered without a scan, and
    a DuckDB oracle re-derives it bit-exactly. Different seeds give
    independent splits (seed advances the splitmix stream by the
    standard golden-ratio increment). One streaming pruned-column pass;
    output (doc_id, source, split)."""
    import ray.data as rd

    from .similarity import _splitmix64

    if fractions is None:
        fractions = {"train": 0.9, "val": 0.05, "test": 0.05}
    bounds = split_boundaries(fractions)
    names = pa.array([n for n, _ in bounds], pa.string())
    uppers = np.asarray([b for _, b in bounds], np.uint64)
    offset = np.uint64((seed * _GOLDEN) % _U64)

    def tag(batch: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = _splitmix64(
                batch["doc_id"].to_numpy().astype(np.uint64) + offset
            )
        idx = np.searchsorted(uppers, h, side="left")
        return pa.Table.from_arrays(
            [batch["doc_id"], batch["source"], names.take(idx)],
            names=["doc_id", "source", "split"],
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def split_by_cluster(
    sf_dir: str,
    fractions: "dict[str, float] | None" = None,
    seed: int = 0,
    threshold: float = 0.5,
    k: int = 3,
):
    """LEAKAGE-FREE train/val/test assignment: the split is a pure
    function of the document's near-duplicate CLUSTER label (the
    connected component from :func:`~.dedup.dedup_clusters`), not of
    the document itself — so two near-duplicate documents can never
    straddle a split boundary and leak train content into test. Same
    boundary rule as :func:`dataset_split` (``splitmix64(cluster +
    seed·golden)`` vs cumulative-fraction u64 boundaries, shared
    verbatim with the SQL oracle); singleton clusters degrade to
    exactly ``dataset_split`` keyed on doc_id, since a singleton's
    label IS its doc_id. Output: (doc_id, cluster, split) — one
    vectorized tag pass over the cluster labels, no extra shuffle
    beyond what the clustering itself does."""
    import ray.data as rd  # noqa: F401  (Dataset flows from dedup_clusters)

    from .dedup import dedup_clusters
    from .similarity import _splitmix64

    if fractions is None:
        fractions = {"train": 0.9, "val": 0.05, "test": 0.05}
    bounds = split_boundaries(fractions)
    names = pa.array([n for n, _ in bounds], pa.string())
    uppers = np.asarray([b for _, b in bounds], np.uint64)
    offset = np.uint64((seed * _GOLDEN) % _U64)

    def tag(batch: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = _splitmix64(
                batch["cluster"].to_numpy().astype(np.uint64) + offset
            )
        idx = np.searchsorted(uppers, h, side="left")
        return pa.Table.from_arrays(
            [batch["doc_id"], batch["cluster"], names.take(idx)],
            names=["doc_id", "cluster", "split"],
        )

    return dedup_clusters(sf_dir, threshold=threshold, k=k).map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True
    )


def _topn_in_order(src_codes, toks, ids, n):
    """Indices of the per-source top-``n`` rows by (n_tokens DESC,
    doc_id ASC), plus each kept row's 1-based rank — one lexsort and
    one running-group-start pass, no per-group Python."""
    m = len(ids)
    if not m:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    order = np.lexsort((ids, -toks, src_codes))
    sc = src_codes[order]
    first = np.ones(m, bool)
    first[1:] = sc[1:] != sc[:-1]
    grp_start = np.maximum.accumulate(np.where(first, np.arange(m), 0))
    rank = np.arange(m) - grp_start
    keep = rank < n
    return order[keep], rank[keep] + 1


def top_per_source(sf_dir: str, n: int = 10):
    """Per-source top-``n`` documents by alnum token count (ties broken
    by ascending doc_id): ``(source, doc_id, n_tokens, rank)``.

    The classic group-wise top-k, built scale-first: every batch first
    reduces to AT MOST ``n`` rows per source it contains (vectorized
    lexsort + running group-start rank — no per-group Python), so the
    ``groupby(source)`` exchange moves ``n × blocks`` tiny rows per
    source instead of the corpus, and the final per-source pass ranks
    a bounded candidate set. NULL sources rank under ``""`` (the same
    fill/coalesce key rule as mixing)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .text_analysis import token_counts_batch

    def partial(batch: pa.Table) -> pa.Table:
        toks = (
            token_counts_batch(batch.select(["doc_id", "text"]))["n_alnum_tokens"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        src = pc.fill_null(batch["source"], "")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        dsrc = src.dictionary_encode()
        codes = dsrc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        keep, _ = _topn_in_order(codes, toks, ids, n)
        return pa.Table.from_arrays(
            [
                src.take(pa.array(keep)),
                pa.array(ids[keep], pa.int64()),
                pa.array(toks[keep], pa.int64()),
            ],
            names=["source", "doc_id", "n_tokens"],
        )

    def final(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy().astype(np.int64)
        toks = group["n_tokens"].to_numpy().astype(np.int64)
        keep, rank = _topn_in_order(np.zeros(len(ids), np.int64), toks, ids, n)
        src = group["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        return pa.Table.from_arrays(
            [
                src.take(pa.array(keep)),
                pa.array(ids[keep], pa.int64()),
                pa.array(toks[keep], pa.int64()),
                pa.array(rank, pa.int64()),
            ],
            names=["source", "doc_id", "n_tokens", "rank"],
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .map_groups(final, batch_format="pyarrow")
    )
