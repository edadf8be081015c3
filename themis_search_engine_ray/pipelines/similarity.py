"""Approximate-nearest-neighbor search over an embedding column.

* :func:`knn_brute` — exact cosine top-k per query: the query matrix is
  broadcast once (``ray.put``), each batch does one float64 matmul
  against it and emits per-batch partial top-k rows; a tiny
  ``groupby(qid).map_groups`` reduce produces the global top-k. This is
  the scale path for "many docs × few queries": shuffle volume is
  #batches × #queries × k rows, never the corpus.

* :func:`ivf_knn` — IVF (inverted-file) ANN: k-means centroids fitted
  on a DISTRIBUTED bounded sample (:func:`sample_embeddings` — a
  deterministic splitmix64 hash filter inside ``map_batches``; ≤ cap
  rows ever reach the driver), broadcast; each batch assigns its
  vectors to lists; at query time only the ``nprobe`` nearest lists are
  scanned. Recall < 1 by design; tested for recall@k against
  :func:`knn_brute`.

Determinism: scores computed in float64, rounded to 6 decimals in
outputs; ordering (cosine desc, vec_id asc) fixed on both engine and
oracle sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.rounding import round_half_up


def _embedding_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (zero-copy flatten)."""
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offs = np.asarray(arr.offsets)
    d = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    return flat.reshape(len(arr), d)


def _normalized(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def load_queries(sf_dir: str, n_queries: int = 10):
    """Fixed query set = the first ``n_queries`` vec_ids (deterministic).

    Distributed min-k: each batch keeps its ``n_queries`` smallest
    vec_ids (one partial-top-k map), the driver reduces the partials —
    at most ``#blocks × n_queries`` tiny rows ever leave the workers,
    never the table."""
    import ray.data as rd

    def partial_min(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        sel = np.argsort(ids, kind="stable")[:n_queries]
        return batch.take(pa.array(np.sort(sel)))

    partials = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(partial_min, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()  # bounded: ≤ #blocks × n_queries rows
    )
    ids = np.asarray([r["vec_id"] for r in partials], np.int64)
    order = np.argsort(ids, kind="stable")[:n_queries]
    qids = ids[order]
    qmat = np.asarray(
        [np.asarray(partials[i]["embedding"], np.float64) for i in order]
    )
    return qids, qmat


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — the deterministic per-row
    uniform hash used for distributed sampling (uint64 wraparound is
    intentional)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def sample_embeddings(sf_dir: str, cap: int = 4096):
    """Distributed bounded sample of the embedding table: a
    deterministic splitmix64(vec_id) threshold filter runs inside
    ``map_batches`` (each task forwards ~3·cap/N of its rows), then the
    driver keeps the ``cap`` smallest hashes. At most ~3·cap rows ever
    reach the driver regardless of table size — the scale path for
    fitting IVF centroids (no driver-side table read). The result is a
    pure function of the vec_id set (partitioning-independent)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n = ds.count()  # Parquet metadata count — no scan
    if n == 0:
        return np.empty((0, 0), np.float64)
    # oversample 3x so P(fewer than cap survivors) is negligible, then
    # cap exactly by smallest hash (deterministic)
    rate = min(1.0, (3.0 * cap) / n)
    thresh = np.uint64(min(int(rate * 2.0**64), 2**64 - 1))

    def filt(batch: pa.Table) -> pa.Table:
        h = _splitmix64(batch["vec_id"].to_numpy().astype(np.uint64))
        keep = h <= thresh
        out = batch.filter(pa.array(keep))
        return out.append_column("h", pa.array(h[keep].astype(np.int64)))

    rows = ds.map_batches(
        filt, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # bounded: ~3·cap rows
    rows.sort(key=lambda r: (np.uint64(np.int64(r["h"])), r["vec_id"]))
    return np.asarray(
        [np.asarray(r["embedding"], np.float64) for r in rows[:cap]]
    )


def _make_reduce_topk(k: int):
    """THE final top-k reduce shared by brute/IVF/LSH — one definition
    so the tie-break (cosine desc, vec_id asc) and rounding can never
    drift between the pipelines (the value-exact twin contracts depend
    on identical reduce semantics)."""

    def reduce_topk(group: pa.Table) -> pa.Table:
        qid = group["qid"][0].as_py()
        vids = group["vec_id"].to_numpy()
        cos = group["cosine"].to_numpy()
        order = np.lexsort((vids, -cos))[: min(k, vids.size)]
        return pa.Table.from_pydict(
            {
                "qid": pa.array([qid] * order.size, pa.int64()),
                "vec_id": vids[order],
                "cosine": round_half_up(cos[order], 6),
            }
        )

    return reduce_topk


def knn_brute(sf_dir: str, k: int = 5, n_queries: int = 10):
    """Exact cosine top-k (excluding self) per query vector.
    Output: (qid, vec_id, cosine) — k rows per query."""
    import ray
    import ray.data as rd

    qids, qmat = load_queries(sf_dir, n_queries)
    qref = ray.put((qids, _normalized(qmat)))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids_, qn = ray.get(qref)
        vids = batch["vec_id"].to_numpy()
        mat = _normalized(_embedding_matrix(batch["embedding"]))
        cos = qn @ mat.T  # (Q, B)
        out_q, out_v, out_c = [], [], []
        kk = min(k + 1, vids.size)  # +1 in case the query itself is here
        for qi in range(qids_.size):
            row = cos[qi]
            # deterministic batch-local selection (cos desc, vec_id asc)
            # — exact ties at the k boundary resolve identically across
            # batch layouts AND across the brute/IVF-full pipelines
            sel = np.lexsort((vids, -row))[:kk]
            mask = vids[sel] != qids_[qi]
            out_q.extend([qids_[qi]] * int(mask.sum()))
            out_v.extend(vids[sel][mask].tolist())
            out_c.extend(row[sel][mask].tolist())
        return pa.Table.from_pydict(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_c, pa.float64()),
            }
        )

    reduce_topk = _make_reduce_topk(k)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return (
        ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid")
        .map_groups(reduce_topk, batch_format="pyarrow")
    )


def _kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 3):
    rng = np.random.RandomState(seed)
    idx = rng.choice(sample.shape[0], size=min(n_clusters, sample.shape[0]), replace=False)
    cents = sample[idx].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(cents.shape[0]):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(axis=0)
    return cents


def ivf_knn(sf_dir: str, k: int = 5, n_queries: int = 10, n_lists: int = 8, nprobe: int = 2):
    """IVF-ANN: scan only the ``nprobe`` nearest centroid lists per query.
    Same output schema as :func:`knn_brute`; recall measured in tests."""
    import ray
    import ray.data as rd

    qids, qmat = load_queries(sf_dir, n_queries)
    qn = _normalized(qmat)

    # fit centroids on a DISTRIBUTED bounded sample (≤4096 rows ever
    # reach the driver — no driver-side table read at any corpus size)
    sample = _normalized(sample_embeddings(sf_dir, cap=4096))
    cents = _kmeans_fit(sample, n_lists)
    # per-query probe lists
    qd = ((qn[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd, axis=1)[:, :nprobe]  # (Q, nprobe)
    ref = ray.put((qids, qn, cents, probes))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids_, qn_, cents_, probes_ = ray.get(ref)
        vids = batch["vec_id"].to_numpy()
        mat = _normalized(_embedding_matrix(batch["embedding"]))
        d = ((mat[:, None, :] - cents_[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # IVF list per vector
        cos = qn_ @ mat.T
        out_q, out_v, out_c = [], [], []
        for qi in range(qids_.size):
            probe_mask = np.isin(assign, probes_[qi])
            probe_mask &= vids != qids_[qi]
            if not probe_mask.any():
                continue
            row = cos[qi][probe_mask]
            pv = vids[probe_mask]
            kk = min(k, pv.size)
            # deterministic selection — see knn_brute.partial_topk
            sel = np.lexsort((pv, -row))[:kk]
            out_q.extend([qids_[qi]] * sel.size)
            out_v.extend(pv[sel].tolist())
            out_c.extend(row[sel].tolist())
        return pa.Table.from_pydict(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_c, pa.float64()),
            }
        )

    reduce_topk = _make_reduce_topk(k)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return (
        ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid")
        .map_groups(reduce_topk, batch_format="pyarrow")
    )


def _band_buckets(mat: np.ndarray, H: np.ndarray, bands: int, bits: int) -> np.ndarray:
    """(n, bands) int64 bucket ids: sign bits of ``mat @ H`` packed per
    band. bits=0 packs to bucket 0 everywhere (the recall-1.0
    degenerate banding)."""
    weights = 1 << np.arange(bits, dtype=np.int64)
    signs = (mat @ H) > 0  # (n, bands*bits)
    return signs.reshape(mat.shape[0], bands, bits).astype(np.int64) @ weights


def lsh_knn(sf_dir: str, k: int = 5, n_queries: int = 10, bands: int = 16, bits: int = 4):
    """LSH-bucketed ANN — the second scale path beside :func:`ivf_knn`:
    random-hyperplane band buckets instead of centroid lists, so there
    is NO training pass at all (the 'index' is a broadcast (dim,
    bands·bits) matrix, a pure function of the seed — any worker, any
    cluster size, any re-run derives the same buckets).

    A vector is a candidate for a query iff they share a bucket in ≥1
    band (recall for angle θ is ``1-(1-(1-θ/π)^bits)^bands``; measured
    against :func:`knn_brute` in tests). Per batch: one matmul for the
    sign bits, one (n, Q) band-equality mask, exact cosine rescoring of
    candidates only, per-batch partial top-k — shuffle volume stays
    #batches × #queries × k, never the corpus. Same output schema and
    deterministic tie-break as :func:`knn_brute`.

    ``bits=0`` degenerates every band to bucket 0 — candidate recall
    provably 1.0 and output identical to :func:`knn_brute`
    (:func:`lsh_knn_full`, the value-exact driver twin)."""
    import ray
    import ray.data as rd

    from .dedup import _hyperplanes

    qids, qmat = load_queries(sf_dir, n_queries)
    qn = _normalized(qmat)
    if qn.size == 0:
        return rd.from_arrow(
            pa.table(
                {"qid": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        )
    H = _hyperplanes(qn.shape[1], bands * bits)
    q_buckets = _band_buckets(qn, H, bands, bits)  # (Q, bands)
    ref = ray.put((qids, qn, H, q_buckets))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids_, qn_, H_, qb_ = ray.get(ref)
        vids = batch["vec_id"].to_numpy()
        mat = _normalized(_embedding_matrix(batch["embedding"]))
        vb = _band_buckets(mat, H_, bands, bits)  # (n, bands)
        # candidate iff any band bucket matches: (n, Q) via bands
        # small-dim broadcasting — one comparison per (vec, query, band)
        match = (vb[:, None, :] == qb_[None, :, :]).any(axis=2)  # (n, Q)
        # rescore CANDIDATES ONLY: restrict the matmul to the union of
        # bucket-matched vectors (the scale advantage — at production
        # banding the union is a small fraction of the batch; with
        # bits=0 the union is the whole batch and the restricted matmul
        # runs on a contiguous copy of identical values, keeping the
        # recall-1.0 twin bit-identical to knn_brute)
        any_mask = match.any(axis=1)
        empty = pa.Table.from_pydict(
            {
                "qid": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if not any_mask.any():
            return empty
        sub = mat[any_mask]
        vids_sub = vids[any_mask]
        match_sub = match[any_mask]
        cos = qn_ @ sub.T  # (Q, m) — m = union candidates only
        out_q, out_v, out_c = [], [], []
        for qi in range(qids_.size):
            probe_mask = match_sub[:, qi] & (vids_sub != qids_[qi])
            if not probe_mask.any():
                continue
            row = cos[qi][probe_mask]
            pv = vids_sub[probe_mask]
            kk = min(k, pv.size)
            # deterministic selection — see knn_brute.partial_topk
            sel = np.lexsort((pv, -row))[:kk]
            out_q.extend([qids_[qi]] * sel.size)
            out_v.extend(pv[sel].tolist())
            out_c.extend(row[sel].tolist())
        return pa.Table.from_pydict(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_c, pa.float64()),
            }
        )

    reduce_topk = _make_reduce_topk(k)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return (
        ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid")
        .map_groups(reduce_topk, batch_format="pyarrow")
    )


def lsh_knn_full(sf_dir: str, k: int = 5, n_queries: int = 10):
    """:func:`lsh_knn` with one zero-bit band — candidate recall
    provably 1.0, output == :func:`knn_brute` (its oracle is this
    function's oracle too)."""
    return lsh_knn(sf_dir, k=k, n_queries=n_queries, bands=1, bits=0)


def knn_label_consistency(
    sf_dir: str, k: int = 10, chunk_rows: int = 8192, num_shards: int = 64
):
    """Embedding-space label agreement: for every vector, the majority
    label among its ``k`` nearest cosine neighbors (self excluded;
    neighbor ties broken by (cosine desc, vec_id asc) — the
    :func:`knn_brute` contract whose bit-parity with DuckDB's
    ``list_cosine_similarity`` the gate already proves; vote ties
    broken by smallest label). Output: (vec_id, label, predicted,
    n_votes) — the standard kNN-classifier diagnostic for embedding
    quality / label noise.

    Shape: all-pairs is inherently Ω(N²) like
    :func:`~.dedup.embedding_dup_pairs` and distributes the same way —
    chunked blocked cross product over object-store Arrow refs (driver
    holds O(C) refs, a task holds two chunks). Each (i ≤ j) block emits
    k-row PARTIAL top-k lists for both chunk sides (top-k is a
    semilattice), then ONE coarse shard exchange (never a per-vector
    groupby) reduces each vector's partials and votes with pure
    lexsort/segment kernels — no per-vector Python anywhere. For
    corpora where C(C+1)/2 blocks are unaffordable, bucket candidates
    with the :func:`lsh_knn` hyperplane bands first (documented recall)
    and feed the survivors through the same reduce."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    n = ds.count()
    n_chunks = max(1, (n + chunk_rows - 1) // chunk_rows)
    refs = ds.repartition(n_chunks).materialize().to_arrow_refs()
    n_chunks = len(refs)

    def _load(ref):
        t = ray.get(ref)
        ids = t["vec_id"].to_numpy().astype(np.int64)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        return ids, labels, _normalized(_embedding_matrix(t["embedding"]))

    def _partial_rows(ids_r, labs_r, ids_c, labs_c, cos):
        """Per row of `cos`: its top-(k+1) columns by (cos desc, id asc),
        self filtered out, capped at k — the knn_brute selection. Per
        row: O(C) argpartition to a candidate set (widened to ALL
        boundary ties so exact cosine ties at the cutoff still resolve
        by id, not partition order), then a small lexsort of just the
        candidates — no full per-row sort."""
        kk = min(k + 1, ids_c.size)
        out = []
        for r in range(ids_r.size):
            row = cos[r]
            if kk == ids_c.size:
                cand = np.arange(ids_c.size)
            else:
                part = np.argpartition(-row, kk - 1)[:kk]
                thr = row[part].min()
                cand = np.flatnonzero(row >= thr)
            order = np.lexsort((ids_c[cand], -row[cand]))
            sel = cand[order][:kk]
            sel = sel[ids_c[sel] != ids_r[r]][:k]
            out.append(
                (
                    np.full(sel.size, ids_r[r], np.int64),
                    np.full(sel.size, labs_r[r], np.int64),
                    labs_c[sel],
                    row[sel],
                    ids_c[sel],
                )
            )
        cols = [np.concatenate(x) if out else np.empty(0) for x in zip(*out)] or [
            np.empty(0, np.int64)
        ] * 5
        return cols

    def block(batch: pa.Table, refs=refs) -> pa.Table:
        vs, ls, nls, cs, nids = [], [], [], [], []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ids_a, lab_a, mat_a = _load(refs[i])
            if i == j:
                ids_b, lab_b, mat_b = ids_a, lab_a, mat_a
            else:
                ids_b, lab_b, mat_b = _load(refs[j])
            cos = mat_a @ mat_b.T
            got = _partial_rows(ids_a, lab_a, ids_b, lab_b, cos)
            for acc, arr in zip((vs, ls, nls, cs, nids), got):
                acc.append(arr)
            if i != j:
                got = _partial_rows(ids_b, lab_b, ids_a, lab_a, cos.T)
                for acc, arr in zip((vs, ls, nls, cs, nids), got):
                    acc.append(arr)
        v = np.concatenate(vs) if vs else np.empty(0, np.int64)
        return pa.Table.from_pydict(
            {
                "vec_id": v.astype(np.int64),
                "label": (np.concatenate(ls) if ls else np.empty(0)).astype(np.int64),
                "nlabel": (np.concatenate(nls) if nls else np.empty(0)).astype(np.int64),
                "cos": (np.concatenate(cs) if cs else np.empty(0)).astype(np.float64),
                "nid": (np.concatenate(nids) if nids else np.empty(0)).astype(np.int64),
                "shard": (v % num_shards).astype(np.int64),
            }
        )

    def vote_shard(group: pa.Table) -> pa.Table:
        v = group["vec_id"].to_numpy().astype(np.int64)
        lab = group["label"].to_numpy().astype(np.int64)
        nl = group["nlabel"].to_numpy().astype(np.int64)
        c = group["cos"].to_numpy().astype(np.float64)
        nid = group["nid"].to_numpy().astype(np.int64)
        # global top-k per vector over the chunk partials
        order = np.lexsort((nid, -c, v))
        sv = v[order]
        new = np.ones(sv.size, bool)
        new[1:] = sv[1:] != sv[:-1]
        seg = np.flatnonzero(new)[np.cumsum(new) - 1]
        keep = (np.arange(sv.size) - seg) < k
        kv, klab, knl = sv[keep], lab[order][keep], nl[order][keep]
        # votes: count per (vec, nlabel), then first by (cnt desc,
        # nlabel asc) per vec
        key = np.stack([kv, knl], axis=1)
        ukey, cnt = np.unique(key, axis=0, return_counts=True)
        o2 = np.lexsort((ukey[:, 1], -cnt, ukey[:, 0]))
        uv = ukey[o2, 0]
        first = np.ones(uv.size, bool)
        first[1:] = uv[1:] != uv[:-1]
        pred_v = uv[first]
        pred_l = ukey[o2, 1][first]
        votes = cnt[o2][first]
        # own label per vec (constant within a vec's rows; kv and
        # pred_v are both ascending, so one searchsorted maps them)
        own_first = np.ones(kv.size, bool)
        own_first[1:] = kv[1:] != kv[:-1]
        own_ids, own_lab = kv[own_first], klab[own_first]
        return pa.Table.from_pydict(
            {
                "vec_id": pred_v,
                "label": own_lab[np.searchsorted(own_ids, pred_v)],
                "predicted": pred_l.astype(np.int64),
                "n_votes": votes.astype(np.int64),
            }
        )

    items = [
        {"i": i, "j": j} for i in range(n_chunks) for j in range(i, n_chunks)
    ]
    return (
        rd.from_items(items)
        .map_batches(block, batch_format="pyarrow", batch_size=1)
        .groupby("shard")
        .map_groups(vote_shard, batch_format="pyarrow")
    )
