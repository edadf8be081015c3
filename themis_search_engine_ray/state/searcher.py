"""BM25 query serving over memory-mapped index shards (actor pool).

Replaces the reference's query path — full vocabulary HashMap + seekable
postings/documents RandomAccessFiles in one JVM
(``themis/indexer/Indexer.java:1450-1473``,
``themis/retrieval/models/OkapiBM25.java:189-309``) — with:

* ``ShardIndex`` — one doc_id-range shard (salt bucket): memory-maps
  that salt's segment parquet files from every build partition
  (``compression=NONE`` → zero-copy mmap buffers), holds a
  term → posting-run directory and that range's doc_stats as sorted
  numpy arrays. Per-query work is fully vectorized: varint-decode runs,
  ``searchsorted`` dl lookup, BM25 kernel, single ``np.add.at``
  accumulation in ascending-term order (bit-identical to the oracle's
  accumulation order), lexsort tie-break (score desc, conv asc, turn asc).
* ``ShardSearcher`` — a Ray actor wrapping ``ShardIndex``; one per
  shard (or several shards per actor). Queries fan out to all shards,
  each returns its exact top-k, the driver merge-sort reduces to the
  global top-k (north_rule).
* ``SearchEngine`` — driver facade: analyzer, global df/idf lookup
  (term_stats; idf computed once on the driver so every shard and the
  oracle use the identical scalar), actor fan-out, final merge.

Global idf uses df summed across all shards/partitions (term_stats), so
sharding never changes scores.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..functions.analyzer import AnalyzerConfig, analyze_query, analyze_query_weighted
from ..functions.bm25 import idf as bm25_idf
from ..functions.bm25 import term_score
from ..pipelines.index_build import load_meta
from ..stages.codec import (
    all_tfs,
    decode_all_docs,
    decode_doc_block,
    decode_positions,
    decode_tf_block,
    skips_from_bytes,
)


@dataclass
class Hit:
    conv_id: str
    turn_idx: int
    score: float


class TermDirectory:
    """Global term → df directory backed by Arrow buffers.

    The reference loads its whole vocabulary into a Java HashMap
    (``Indexer.java:1450-1473``); a Python dict of 10^8 terms is the
    same wrong trade. Here the (term, df) columns stay in Arrow memory
    (contiguous buffers, no per-term Python objects), sorted once with
    a vectorized kernel; lookups binary-search with O(log n) `.as_py()`
    accesses — a handful per query term."""

    def __init__(self, ts_dir: str):
        import pyarrow as pa
        import pyarrow.compute as pc

        tab = pads.dataset(ts_dir, format="parquet").to_table(columns=["term", "df"])
        idx = pc.sort_indices(tab["term"])
        self._terms = tab["term"].take(idx).combine_chunks()
        self._dfs = tab["df"].take(idx).combine_chunks()
        if isinstance(self._terms, pa.ChunkedArray):
            self._terms = (
                self._terms.chunk(0) if self._terms.num_chunks else pa.array([], pa.string())
            )
        if isinstance(self._dfs, pa.ChunkedArray):
            self._dfs = (
                self._dfs.chunk(0) if self._dfs.num_chunks else pa.array([], pa.int64())
            )
        self._n = len(self._terms)

    def __len__(self) -> int:
        return self._n

    def get(self, term: str, default=None):
        lo, hi = 0, self._n
        while lo < hi:
            mid = (lo + hi) // 2
            if self._terms[mid].as_py() < term:
                lo = mid + 1
            else:
                hi = mid
        if lo < self._n and self._terms[lo].as_py() == term:
            return int(self._dfs[lo].as_py())
        return default

    def __getitem__(self, term: str) -> int:
        df = self.get(term)
        if df is None:
            raise KeyError(term)
        return df


def fetch_texts(index_dir: str, hits) -> dict[tuple[str, int], str]:
    """Fetch stored turn texts for ranked hits — the working equivalent
    of the reference's RESULT_TYPE.FULL, which is declared but returns
    null (``themis/indexer/Indexer.java:1754-1783``). Requires an index
    built with ``BuildConfig(store_text=True)``; returns {} otherwise.
    Reads only the doc-stat row groups matching the hits' doc ids."""
    import pyarrow.compute as pc

    from ..stages.tokenize import doc_key

    want = {doc_key(h.conv_id, h.turn_idx): (h.conv_id, h.turn_idx) for h in hits}
    if not want:
        return {}
    compacted = os.path.join(index_dir, "compacted", "doc_stats")
    if os.path.isdir(compacted):
        roots = [compacted]
    else:
        part_root = os.path.join(index_dir, "partitions")
        roots = [
            os.path.join(part_root, p, "doc_stats")
            for p in sorted(os.listdir(part_root))
        ]
    ids = [int(i) for i in want]
    out: dict[tuple[str, int], str] = {}
    for root in roots:
        if not os.path.isdir(root):
            continue
        dset = pads.dataset(root, format="parquet")
        if "text" not in dset.schema.names:
            continue
        tab = dset.to_table(
            columns=["doc_id", "text"], filter=pc.field("doc_id").isin(ids)
        )
        for did, text in zip(tab["doc_id"].to_pylist(), tab["text"].to_pylist()):
            key = want.get(int(did))
            if key is not None:
                out[key] = text
    return out


def snippets(
    index_dir: str,
    hits,
    query: str,
    window: int = 5,
    config: AnalyzerConfig | None = None,
) -> dict[tuple[str, int], str]:
    """Highlighted snippets for ranked hits (needs store_text=True).

    For each hit: tokenize the stored text, find the first token whose
    stem matches a query stem, and return a ±window-token excerpt with
    matches wrapped in ``[[...]]``. Empty dict when no doc store."""
    from ..functions.analyzer import DEFAULT_CONFIG, analyze_query, tokenize as _tok
    from ..functions.porter import stem_token

    cfg = config or DEFAULT_CONFIG
    stems = set(analyze_query(query, cfg))
    texts = fetch_texts(index_dir, hits)
    out: dict[tuple[str, int], str] = {}
    for key, text in texts.items():
        toks = _tok(text)
        matched = [
            i
            for i, t in enumerate(toks)
            if (stem_token(t) if cfg.use_stemmer else t) in stems
        ]
        if not matched:
            out[key] = " ".join(toks[: 2 * window + 1])
            continue
        lo = max(0, matched[0] - window)
        hi = min(len(toks), matched[0] + window + 1)
        span = set(m for m in matched if lo <= m < hi)
        out[key] = " ".join(
            f"[[{t}]]" if i in span else t for i, t in enumerate(toks[lo:hi], lo)
        )
    return out


class ShardIndex:
    """In-process view of one or more salt shards of the index."""

    def __init__(self, index_dir: str, salts: list[int]):
        meta = load_meta(index_dir)
        self.meta = meta
        self.avgdl = float(meta["avgdl"])
        self.salts = sorted(salts)
        term_parts = int(meta["term_parts"])
        want = set(self.salts)

        # segment discovery: prefer the compacted layout (one merged
        # segment per gkey — see index_build.compact_index) over the raw
        # per-partition runs
        compacted = os.path.join(index_dir, "compacted")
        part_root = os.path.join(index_dir, "partitions")
        if os.path.isdir(os.path.join(compacted, "segments")):
            seg_dirs = [os.path.join(compacted, "segments")]
            ds_roots = [os.path.join(compacted, "doc_stats")]
        else:
            seg_dirs = [
                os.path.join(part_root, p, "segments")
                for p in sorted(os.listdir(part_root))
            ]
            ds_roots = [
                os.path.join(part_root, p, "doc_stats")
                for p in sorted(os.listdir(part_root))
            ]

        # Per-table sorted term columns stay in Arrow buffers; term →
        # runs resolution is a binary search per table (SegmentWriter
        # and compact_index both write terms sorted). No per-term Python
        # dict — the reference's all-in-RAM vocabulary HashMap pattern
        # does not survive 10^8-term vocabularies.
        self.tables = []
        self._table_terms = []
        for seg_dir in seg_dirs:
            if not os.path.isdir(seg_dir):
                continue
            for fname in sorted(os.listdir(seg_dir)):
                if not fname.endswith(".parquet"):
                    continue
                gkey = int(fname[4:-8])  # seg-{gkey:08d}.parquet
                if gkey // term_parts not in want:
                    continue
                tab = pq.read_table(
                    os.path.join(seg_dir, fname), memory_map=True
                ).combine_chunks()
                self.tables.append(tab)
                col = tab["term"]
                self._table_terms.append(
                    col.chunk(0) if col.num_chunks else col.combine_chunks()
                )
        self._runs_memo: dict[str, list[tuple[int, int]]] = {}

        # doc_stats for these salt ranges, sorted by doc_id
        frames = []
        for ds_dir in ds_roots:
            if not os.path.isdir(ds_dir):
                continue
            for s in self.salts:
                sdir = os.path.join(ds_dir, f"salt={s}")
                if os.path.isdir(sdir):
                    dset = pads.dataset(sdir, format="parquet")
                    cols = ["doc_id", "conv_id", "turn_idx", "dl"]
                    for opt in ("role", "tiebreak"):
                        if opt in dset.schema.names:
                            cols.append(opt)
                    frames.append(dset.to_table(columns=cols))
        import pyarrow as pa

        if frames:
            stats = pa.concat_tables(frames, promote_options="default")
            ids = stats["doc_id"].to_numpy().astype(np.uint64)
            order = np.argsort(ids, kind="stable")
            self.doc_ids = ids[order]
            self.dl = stats["dl"].to_numpy().astype(np.float64)[order]
            self.turn = stats["turn_idx"].to_numpy().astype(np.int32)[order]
            # conv ids stay in Arrow buffers (no per-doc Python/numpy-U
            # strings — 1e9 docs/shard would not fit otherwise); the
            # (conv asc, turn asc) tie-break is precomputed as an int
            # ordinal so per-query sorts touch only ints, and strings
            # are materialized for the top-k hits alone
            conv_arr = stats["conv_id"].take(pa.array(order)).combine_chunks()
            if isinstance(conv_arr, pa.ChunkedArray):
                conv_arr = (
                    conv_arr.chunk(0) if conv_arr.num_chunks else pa.array([], pa.string())
                )
            self._conv = conv_arr
            if "tiebreak" in stats.column_names:
                # compaction precomputed the global (conv, turn) ordinal
                self.tiebreak = stats["tiebreak"].to_numpy().astype(np.int64)[order]
            else:
                conv_obj = np.asarray(self._conv.to_pylist(), dtype=object)
                tb_order = np.lexsort((self.turn, conv_obj))
                self.tiebreak = np.empty(ids.size, np.int64)
                self.tiebreak[tb_order] = np.arange(ids.size, dtype=np.int64)
            # role codes for fielded filtering (indexes built with_role)
            self.role_index: dict[str, int] = {}
            self.role_code = None
            if "role" in stats.column_names:
                role_list = stats["role"].take(pa.array(order)).to_pylist()
                codes = np.empty(len(role_list), np.int16)
                for i, r in enumerate(role_list):
                    r = r or ""
                    c = self.role_index.setdefault(r, len(self.role_index))
                    codes[i] = c
                self.role_code = codes
        else:
            self.doc_ids = np.empty(0, np.uint64)
            self.dl = np.empty(0, np.float64)
            self.turn = np.empty(0, np.int32)
            self._conv = pa.array([], pa.string())
            self.tiebreak = np.empty(0, np.int64)
            self.role_index = {}
            self.role_code = None
        # tightest safe dl for per-term/block score upper bounds (BM25
        # contribution is decreasing in dl, increasing in tf)
        self.dl_min = float(self.dl.min()) if self.dl.size else 0.0
        # stats of the last pruned query (observability + tests)
        self.last_prune_stats: dict = {}
        # decoded-run LRU (see _decode_run)
        from collections import OrderedDict

        self._run_cache: OrderedDict = OrderedDict()
        self._cache_bytes = 0

        # VSM doc norms (optional: present after build_norms ran),
        # aligned to self.doc_ids
        self.norms: np.ndarray | None = None
        norm_root = os.path.join(index_dir, "norms")
        if os.path.isdir(norm_root):
            nframes = []
            for s in self.salts:
                sdir = os.path.join(norm_root, f"salt={s}")
                if os.path.isdir(sdir):
                    nframes.append(
                        pads.dataset(sdir, format="parquet").to_table(
                            columns=["doc_id", "norm"]
                        )
                    )
            self.norms = np.zeros(self.doc_ids.size, np.float64)
            if nframes:
                import pyarrow as pa

                ntab = pa.concat_tables(nframes)
                nids = ntab["doc_id"].to_numpy().astype(np.uint64)
                pos = np.searchsorted(self.doc_ids, nids)
                self.norms[pos] = ntab["norm"].to_numpy()

    def term_runs(self, term: str) -> list[tuple[int, int]]:
        """All (table, row) posting runs of a term in this shard —
        binary search over each table's sorted term column, memoized."""
        hit = self._runs_memo.get(term)
        if hit is not None:
            return hit
        out = []
        for ti, terms in enumerate(self._table_terms):
            lo, hi = 0, len(terms)
            while lo < hi:
                mid = (lo + hi) // 2
                if terms[mid].as_py() < term:
                    lo = mid + 1
                else:
                    hi = mid
            if lo < len(terms) and terms[lo].as_py() == term:
                out.append((ti, lo))
        self._runs_memo[term] = out
        return out

    # decoded-postings cache budget (bytes of ids+tfs kept hot); hot
    # terms dominate query mixes, so caching their decoded runs removes
    # the varint decode from the steady-state path (the mmap'd encoded
    # blobs stay the backing store — same pattern as a block cache)
    CACHE_BYTES = 256 << 20

    def _run_entry(self, ti: int, row: int):
        """Cached decoded run: (ids, tfs, f) where
        ``f = tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))`` is the
        query-independent BM25 factor — per-query scoring is then just
        ``idf × f`` (the identical float op order as term_score, so
        scores stay bit-equal)."""
        key = (ti, row)
        cached = self._run_cache.get(key)
        if cached is not None:
            self._run_cache.move_to_end(key)
            return cached
        tab = self.tables[ti]
        skips = skips_from_bytes(tab["skips"][row].as_buffer())
        ids = decode_all_docs(tab["docs"][row].as_buffer(), skips)
        tfs = all_tfs(tab["tfs"][row].as_buffer())
        if ids.size:
            dl = self.dl[np.searchsorted(self.doc_ids, ids)]
            f = term_score(tfs, dl, self.avgdl, 1.0)
        else:
            f = np.empty(0, np.float64)
        entry = (ids, tfs, f)
        nbytes = ids.nbytes + tfs.nbytes + f.nbytes
        if nbytes <= self.CACHE_BYTES:
            self._run_cache[key] = entry
            self._cache_bytes += nbytes
            while self._cache_bytes > self.CACHE_BYTES and self._run_cache:
                _, (oi, ot, of) = self._run_cache.popitem(last=False)
                self._cache_bytes -= oi.nbytes + ot.nbytes + of.nbytes
        return entry

    def _decode_run(self, ti: int, row: int):
        ids, tfs, _ = self._run_entry(ti, row)
        return ids, tfs

    def _eval_run(self, ti: int, row: int, t_idf: float):
        """Contributions of one run: idf × cached query-independent
        factor (bit-equal to term_score — see _run_entry)."""
        ids, _, f = self._run_entry(ti, row)
        if ids.size == 0:
            return None
        return ids, t_idf * f

    @staticmethod
    def _member_mask(sorted_vals: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
        """Membership of ascending ``sorted_vals`` in ascending unique
        ``sorted_set`` via binary search (cheaper than np.isin)."""
        if sorted_set.size == 0 or sorted_vals.size == 0:
            return np.zeros(sorted_vals.size, bool)
        pos = np.searchsorted(sorted_set, sorted_vals)
        np.minimum(pos, sorted_set.size - 1, out=pos)
        return sorted_set[pos] == sorted_vals

    def _probe_run(self, ti: int, row: int, t_idf: float, cands: np.ndarray):
        """Probe a non-essential term's run at candidate docs only.

        If the run is already in the decoded-run cache, or candidates
        touch most of its blocks, mask the (cached) full decode — one
        vectorized membership pass. Otherwise decode ONLY the blocks
        that may contain a candidate (skip-entry binary search) — the
        block-max skip path that avoids materializing cold hot-term
        runs. ``cands`` must be sorted+unique. Both paths produce
        bit-identical contributions (idf × the same factor values)."""
        tab = self.tables[ti]
        skips = skips_from_bytes(tab["skips"][row].as_buffer())
        if skips.size == 0 or cands.size == 0:
            return None, 0, int(skips.size)
        total_blocks = int(skips.size)
        if (ti, row) not in self._run_cache:
            last = skips["last_doc"]
            bi = np.searchsorted(last, cands)  # block that could hold each cand
            need = np.unique(bi[bi < last.size])
            if need.size == 0:
                return None, 0, total_blocks
            if 4 * need.size < total_blocks:  # sparse: per-block decode
                doc_blob = tab["docs"][row].as_buffer()
                tf_blob = tab["tfs"][row].as_buffer()
                ids_out, tf_out = [], []
                for b in need:
                    b = int(b)
                    ids_b = decode_doc_block(doc_blob, skips, b)
                    hit = self._member_mask(ids_b, cands)
                    if hit.any():
                        ids_out.append(ids_b[hit])
                        tf_out.append(decode_tf_block(tf_blob, skips, b)[hit])
                if not ids_out:
                    return None, int(need.size), total_blocks
                ids = np.concatenate(ids_out)
                tfs = np.concatenate(tf_out)
                pos = np.searchsorted(self.doc_ids, ids)
                contrib = term_score(tfs, self.dl[pos], self.avgdl, t_idf)
                return (ids, contrib), int(need.size), total_blocks
        # dense or cached: full decode (through the cache), one mask
        ids, _, f = self._run_entry(ti, row)
        hit = self._member_mask(ids, cands)
        if not hit.any():
            return None, total_blocks, total_blocks
        return (ids[hit], t_idf * f[hit]), total_blocks, total_blocks

    def _rank(self, id_chunks, sc_chunks, k: int, role_code: int | None = None):
        """Accumulate per-term contribution chunks (already in ascending
        term order — the oracle's accumulation order) and return the
        top-k with the deterministic tie-break. ``role_code`` filters
        hits to one role (fielded search) before the cut — BM25 stats
        (idf, avgdl) stay corpus-global by design."""
        cand = np.concatenate(id_chunks)
        contrib = np.concatenate(sc_chunks)
        uniq, inv = np.unique(cand, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(acc, inv, contrib)  # sequential adds in term-asc order
        pos = np.searchsorted(self.doc_ids, uniq)
        if role_code is not None and self.role_code is not None:
            keep = self.role_code[pos] == role_code
            pos, acc = pos[keep], acc[keep]
        return self._take_topk(pos, acc, k)

    def _take_topk(self, pos: np.ndarray, acc: np.ndarray, k: int):
        """Int-only (score desc, tie-break-ordinal asc) sort; conv
        strings materialized from Arrow for the k winners only."""
        order = np.lexsort((self.tiebreak[pos], -acc))[: min(k, acc.size)]
        sel = pos[order]
        conv = [self._conv[int(i)].as_py() for i in sel]
        return conv, self.turn[sel].tolist(), acc[order].tolist()

    def _run_max_tf(self, ti: int, row: int) -> float:
        skips = skips_from_bytes(self.tables[ti]["skips"][row].as_buffer())
        return float(skips["max_tf"].max()) if skips.size else 0.0

    def score_topk(
        self,
        terms: list[str],
        idfs: list[float],
        k: int,
        prune: bool = True,
        role: str | None = None,
    ):
        """Exact shard-local top-k. ``terms`` must be ascending (the
        canonical accumulation order shared with the oracle).
        ``role`` filters hits to that role (requires with_role builds);
        pruning is disabled under a filter — the MaxScore threshold
        would be computed over unfiltered docs and could prune filtered
        winners.

        With ``prune=True`` (default) a MaxScore/block-max pass skips
        posting runs and blocks that provably cannot reach the top-k:
        term upper bounds come from the per-block ``max_tf`` stored in
        the skip entries and the shard's minimum dl; terms whose
        ascending upper-bound prefix sum stays below the phase-1
        threshold are only *probed* at candidate docs (binary search on
        skip entries → decode just those blocks). Safe: prunes only,
        never changes the reported docIDs or scores; falls back to full
        evaluation when any idf ≤ 0 (negative-idf contributions break
        the monotone lower-bound argument) or when fewer than k docs
        match the top-impact term.
        """
        run_lists = [self.term_runs(t) for t in terms]
        n_terms = len(terms)
        self.last_prune_stats = {}
        role_code = None
        if role is not None:
            if self.role_code is None or role not in self.role_index:
                return [], [], []  # no such role in this shard / no role data
            role_code = self.role_index[role]
        if (
            not prune
            or role_code is not None
            or k <= 0
            or n_terms < 2
            or self.doc_ids.size == 0
            or any(i <= 0.0 for i in idfs)
        ):
            return self._score_full(run_lists, idfs, k, role_code=role_code)

        # term-level upper bounds from block maxima
        ubs = np.zeros(n_terms, dtype=np.float64)
        for t, (runs, t_idf) in enumerate(zip(run_lists, idfs)):
            mx = max((self._run_max_tf(ti, row) for ti, row in runs), default=0.0)
            if mx > 0.0:
                ubs[t] = term_score(mx, self.dl_min, self.avgdl, t_idf)

        # phase 1: fully evaluate the highest-impact term → threshold θ
        top_t = int(np.argmax(ubs))
        evaluated: dict[int, list] = {t: [] for t in range(n_terms)}
        for ti, row in run_lists[top_t]:
            r = self._eval_run(ti, row, idfs[top_t])
            if r is not None:
                evaluated[top_t].append(r)
        if not evaluated[top_t]:
            return self._score_full(run_lists, idfs, k)
        # a doc appears in exactly one run of a term (doc-range partitioned)
        sc0 = np.concatenate([c for _, c in evaluated[top_t]])
        if sc0.size < k:
            # can't establish a threshold covering k docs → no safe pruning
            return self._score_full(run_lists, idfs, k, pre=evaluated)
        theta = float(np.partition(sc0, sc0.size - k)[sc0.size - k])

        # essential / non-essential split (ascending-ub prefix sums);
        # strict margin keeps the bound provably safe under fp rounding
        asc = np.argsort(ubs, kind="stable")
        cum = np.cumsum(ubs[asc])
        margin = 1e-9 * abs(theta) + 1e-12
        non_ess = {int(t) for i, t in enumerate(asc) if cum[i] < theta - margin}
        non_ess.discard(top_t)
        essential = [t for t in range(n_terms) if t not in non_ess]
        if not non_ess:
            return self._score_full(run_lists, idfs, k, pre=evaluated)

        for t in essential:
            if t == top_t:
                continue
            for ti, row in run_lists[t]:
                r = self._eval_run(ti, row, idfs[t])
                if r is not None:
                    evaluated[t].append(r)

        ess_ids = [i for t in essential for i, _ in evaluated[t]]
        ess_sc = [c for t in essential for _, c in evaluated[t]]
        cands = np.unique(np.concatenate(ess_ids))
        # refine: drop candidates whose essential score + Σ non-essential
        # upper bounds can't reach θ (ε-padded for fp safety)
        acc = np.zeros(cands.size, dtype=np.float64)
        for i, c in zip(ess_ids, ess_sc):
            np.add.at(acc, np.searchsorted(cands, i), c)
        r_ne = float(sum(ubs[t] for t in non_ess))
        cands = cands[acc + r_ne >= theta - margin]

        probed_blocks = total_blocks = 0
        for t in sorted(non_ess):
            for ti, row in run_lists[t]:
                r, nprobe, ntotal = self._probe_run(ti, row, idfs[t], cands)
                probed_blocks += nprobe
                total_blocks += ntotal
                if r is not None:
                    evaluated[t].append(r)

        self.last_prune_stats = {
            "pruned": True,
            "theta": theta,
            "essential_terms": len(essential),
            "non_essential_terms": len(non_ess),
            "candidates": int(cands.size),
            "probed_blocks": probed_blocks,
            "non_essential_blocks_total": total_blocks,
        }
        id_chunks = [i for t in range(n_terms) for i, _ in evaluated[t]]
        sc_chunks = [c for t in range(n_terms) for _, c in evaluated[t]]
        if not id_chunks:
            return [], [], []
        return self._rank(id_chunks, sc_chunks, k)

    def _run_positions(self, ti: int, row: int) -> list:
        """Decode a run's per-doc position lists (parallel to doc order)."""
        tab = self.tables[ti]
        skips = skips_from_bytes(tab["skips"][row].as_buffer())
        pos_blob = tab["pos"][row].as_buffer()
        out = []
        for bi in range(len(skips)):
            start = int(skips[bi]["pos_off"])
            end = (
                int(skips[bi + 1]["pos_off"])
                if bi + 1 < len(skips)
                else len(pos_blob)
            )
            out.extend(
                decode_positions(bytes(pos_blob[start:end]), int(skips[bi]["n_docs"]))
            )
        return out

    def phrase_topk(
        self, stems: list[str], offsets: list[int], idfs: dict[str, float], k: int
    ):
        """Exact-phrase shard top-k over the positional index: intersect
        doc sets of the phrase stems, verify token-offset alignment
        (stopword slots preserved), BM25-score matches over the unique
        stems (ascending accumulation — canonical), rank with tie-break.
        Positions are decoded only for docs that survive the doc-set
        intersection."""
        uniq = sorted(set(stems))
        # doc-set intersection (smallest first)
        per_stem_ids: dict[str, np.ndarray] = {}
        for s in uniq:
            chunks = [
                self._decode_run(ti, row)[0] for ti, row in self.term_runs(s)
            ]
            chunks = [c for c in chunks if c.size]
            if not chunks:
                return [], [], []
            ids = np.concatenate(chunks)
            ids.sort()  # runs from different partitions interleave
            per_stem_ids[s] = ids
        cand = None
        for s in sorted(uniq, key=lambda s: per_stem_ids[s].size):
            cand = (
                per_stem_ids[s]
                if cand is None
                else np.intersect1d(cand, per_stem_ids[s], assume_unique=True)
            )
            if cand.size == 0:
                return [], [], []

        # positions for candidates only
        pos_maps: dict[str, dict[int, np.ndarray]] = {s: {} for s in uniq}
        for s in uniq:
            pm = pos_maps[s]
            for ti, row in self.term_runs(s):
                ids, _ = self._decode_run(ti, row)
                mask = self._member_mask(ids, cand)
                if mask.any():
                    plists = self._run_positions(ti, row)
                    for j in np.flatnonzero(mask):
                        pm[int(ids[j])] = plists[j]

        base_s, base_off = stems[0], offsets[0]
        keep = []
        for doc in cand.tolist():
            bases = set(pos_maps[base_s][doc].tolist())
            ok = True
            for s, off in zip(stems[1:], offsets[1:]):
                delta = off - base_off
                bases &= {int(p) - delta for p in pos_maps[s][doc]}
                if not bases:
                    ok = False
                    break
            if ok:
                keep.append(doc)
        if not keep:
            return [], [], []
        keep_arr = np.asarray(keep, np.uint64)
        keep_arr.sort()

        id_chunks, sc_chunks = [], []
        for s in uniq:  # ascending stems == oracle accumulation order
            t_idf = idfs[s]
            for ti, row in self.term_runs(s):
                ids, _, f = self._run_entry(ti, row)
                mask = self._member_mask(ids, keep_arr)
                if mask.any():
                    id_chunks.append(ids[mask])
                    sc_chunks.append(t_idf * f[mask])
        return self._rank(id_chunks, sc_chunks, k)

    def score_topk_vsm(
        self, terms: list[str], idfs: list[float], qweights: list[float], qnorm: float, k: int
    ):
        """VSM cosine shard top-k (``themis/retrieval/models/VSM.java``
        semantics via functions/vsm.py; requires build_norms output).
        ``terms`` ascending; per-doc numerator accumulates in that order."""
        if self.norms is None:
            raise RuntimeError("VSM needs norms/ — run build_norms(index_dir) first")
        id_chunks, sc_chunks = [], []
        for term, t_idf, wq in zip(terms, idfs, qweights):
            for ti, row in self.term_runs(term):
                ids, tfs = self._decode_run(ti, row)
                if ids.size:
                    id_chunks.append(ids)
                    sc_chunks.append((tfs * t_idf) * wq)
        if not id_chunks:
            return [], [], []
        cand = np.concatenate(id_chunks)
        contrib = np.concatenate(sc_chunks)
        uniq, inv = np.unique(cand, return_inverse=True)
        num = np.zeros(uniq.size, np.float64)
        np.add.at(num, inv, contrib)
        pos = np.searchsorted(self.doc_ids, uniq)
        denom = self.norms[pos] * qnorm
        with np.errstate(divide="ignore", invalid="ignore"):
            acc = np.where(denom != 0.0, num / denom, 0.0)
        return self._take_topk(pos, acc, k)

    def candidates_existential(self, terms: list[str], k: int):
        """Boolean OR: distinct matching docs, score 1.0, (conv, turn)
        order (Existential.java:48-131; dedupe divergence documented in
        oracle.search_existential)."""
        id_chunks = []
        for term in terms:
            for ti, row in self.term_runs(term):
                ids, _ = self._decode_run(ti, row)
                if ids.size:
                    id_chunks.append(ids)
        if not id_chunks:
            return [], []
        uniq = np.unique(np.concatenate(id_chunks))
        pos = np.searchsorted(self.doc_ids, uniq)
        order = np.argsort(self.tiebreak[pos], kind="stable")[: min(k, uniq.size)]
        sel = pos[order]
        conv = [self._conv[int(i)].as_py() for i in sel]
        return conv, self.turn[sel].tolist()

    def _score_full(
        self, run_lists, idfs, k, pre: dict | None = None, role_code: int | None = None
    ):
        """Full OR evaluation (every run decoded) — the no-prune path."""
        id_chunks, sc_chunks = [], []
        for t, (runs, t_idf) in enumerate(zip(run_lists, idfs)):
            if pre and pre.get(t):
                for ids, contrib in pre[t]:
                    id_chunks.append(ids)
                    sc_chunks.append(contrib)
                continue
            for ti, row in runs:
                r = self._eval_run(ti, row, t_idf)
                if r is not None:
                    id_chunks.append(r[0])
                    sc_chunks.append(r[1])
        if not id_chunks:
            return [], [], []
        return self._rank(id_chunks, sc_chunks, k, role_code=role_code)


class ShardSearcher:
    """Ray actor holding one or more shards (created via .remote)."""

    def __init__(self, index_dir: str, salts: list[int]):
        self.shard = ShardIndex(index_dir, salts)

    def score_topk(self, terms, idfs, k, prune: bool = True, role: str | None = None):
        return self.shard.score_topk(terms, idfs, k, prune=prune, role=role)

    def score_topk_vsm(self, terms, idfs, qweights, qnorm, k):
        return self.shard.score_topk_vsm(terms, idfs, qweights, qnorm, k)

    def candidates_existential(self, terms, k):
        return self.shard.candidates_existential(terms, k)

    def phrase_topk(self, stems, offsets, idfs, k):
        return self.shard.phrase_topk(stems, offsets, idfs, k)

    def ready(self) -> bool:
        return True


class SearchEngine:
    """Driver facade: analyze → idf → fan out to shard actors → merge."""

    def __init__(self, index_dir: str, num_actors: int | None = None):
        import ray

        self.meta = load_meta(index_dir)
        self.analyzer_cfg = AnalyzerConfig(**self.meta["analyzer"])
        self.n_docs = int(self.meta["n_docs"])
        num_shards = int(self.meta["num_shards"])

        # global term-df directory (Arrow-backed binary search; see
        # TermDirectory — replaces the reference's all-in-RAM HashMap)
        ts_dir = os.path.join(index_dir, "term_stats")
        self.df = (
            TermDirectory(ts_dir) if os.path.isdir(ts_dir) else {}
        )

        num_actors = min(num_actors or num_shards, num_shards)
        groups = [list(range(num_shards))[i::num_actors] for i in range(num_actors)]
        actor_cls = ray.remote(ShardSearcher)
        self.actors = [
            actor_cls.remote(index_dir, salts) for salts in groups if salts
        ]
        ray.get([a.ready.remote() for a in self.actors])

    def search(
        self, query: str, k: int = 10, prune: bool = True, role: str | None = None
    ) -> list[Hit]:
        import ray

        terms_all = analyze_query(query, self.analyzer_cfg)
        terms, idfs = [], []
        for t in terms_all:
            df = self.df.get(t)
            if df:  # unknown terms skipped (OkapiBM25.java:222)
                terms.append(t)
                idfs.append(bm25_idf(float(self.n_docs), df))
        if not terms:
            return []
        parts = ray.get(
            [
                a.score_topk.remote(terms, idfs, k, prune=prune, role=role)
                for a in self.actors
            ]
        )
        merged: list[Hit] = []
        for conv, turn, score in parts:
            merged.extend(Hit(c, int(t), float(s)) for c, t, s in zip(conv, turn, score))
        merged.sort(key=lambda h: (-h.score, h.conv_id, h.turn_idx))
        return merged[: min(k, len(merged))]

    def _vsm_query(self, query: str):
        """Shared VSM query-side math (see functions/vsm.py docstring)."""
        import math

        from ..functions.vsm import idf_int

        qweights = analyze_query_weighted(query, self.analyzer_cfg)
        terms, idfs, wqs = [], [], []
        qn2 = 0.0
        for s in sorted(qweights):
            df = self.df.get(s)
            if df:
                t_idf = idf_int(self.n_docs, df)
                w = qweights[s] * t_idf
                terms.append(s)
                idfs.append(t_idf)
                wqs.append(w)
            else:
                w = qweights[s]  # unknown stems keep raw qtf (VSM.java:186-192)
            qn2 += w * w
        return terms, idfs, wqs, math.sqrt(qn2)

    def search_vsm(self, query: str, k: int = 10) -> list[Hit]:
        import ray

        terms, idfs, wqs, qnorm = self._vsm_query(query)
        if not terms:
            return []
        parts = ray.get(
            [a.score_topk_vsm.remote(terms, idfs, wqs, qnorm, k) for a in self.actors]
        )
        merged: list[Hit] = []
        for conv, turn, score in parts:
            merged.extend(Hit(c, int(t), float(s)) for c, t, s in zip(conv, turn, score))
        merged.sort(key=lambda h: (-h.score, h.conv_id, h.turn_idx))
        return merged[: min(k, len(merged))]

    def search_existential(self, query: str, k: int = 10) -> list[Hit]:
        import ray

        terms = [t for t in analyze_query(query, self.analyzer_cfg) if self.df.get(t)]
        if not terms:
            return []
        parts = ray.get([a.candidates_existential.remote(terms, k) for a in self.actors])
        merged = [(c, int(t)) for conv, turn in parts for c, t in zip(conv, turn)]
        merged.sort()
        return [Hit(c, t, 1.0) for c, t in merged[: min(k, len(merged))]]

    def _phrase_query(self, query: str):
        from ..functions.analyzer import analyze_phrase_query

        terms = analyze_phrase_query(query, self.analyzer_cfg)
        if not terms or any(not self.df.get(s) for s, _ in terms):
            return None  # an unknown stem makes the phrase unmatchable
        stems = [s for s, _ in terms]
        offsets = [o for _, o in terms]
        idfs = {
            s: bm25_idf(float(self.n_docs), self.df[s]) for s in set(stems)
        }
        return stems, offsets, idfs

    def search_phrase(self, query: str, k: int = 10) -> list[Hit]:
        """Exact-phrase BM25 top-k over the positional index (salt shards
        hold disjoint doc ranges, so each shard's phrase match is
        complete; merge is the same top-k reduce)."""
        import ray

        pq = self._phrase_query(query)
        if pq is None:
            return []
        stems, offsets, idfs = pq
        parts = ray.get(
            [a.phrase_topk.remote(stems, offsets, idfs, k) for a in self.actors]
        )
        merged: list[Hit] = []
        for conv, turn, score in parts:
            merged.extend(Hit(c, int(t), float(s)) for c, t, s in zip(conv, turn, score))
        merged.sort(key=lambda h: (-h.score, h.conv_id, h.turn_idx))
        return merged[: min(k, len(merged))]

    def close(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []


class LocalSearchEngine:
    """Single-process engine (no actors) — used by tests/small tools and
    as the per-actor engine for batch query evaluation."""

    def __init__(self, index_dir: str):
        self.meta = load_meta(index_dir)
        self.analyzer_cfg = AnalyzerConfig(**self.meta["analyzer"])
        self.n_docs = int(self.meta["n_docs"])
        self.shard = ShardIndex(index_dir, list(range(int(self.meta["num_shards"]))))
        ts_dir = os.path.join(index_dir, "term_stats")
        # a corpus with zero postings writes no term_stats at all
        self.df = TermDirectory(ts_dir) if os.path.isdir(ts_dir) else {}

    def search(
        self, query: str, k: int = 10, prune: bool = True, role: str | None = None
    ) -> list[Hit]:
        terms_all = analyze_query(query, self.analyzer_cfg)
        terms, idfs = [], []
        for t in terms_all:
            df = self.df.get(t)
            if df:
                terms.append(t)
                idfs.append(bm25_idf(float(self.n_docs), df))
        if not terms:
            return []
        conv, turn, score = self.shard.score_topk(terms, idfs, k, prune=prune, role=role)
        return [Hit(c, int(t), float(s)) for c, t, s in zip(conv, turn, score)]

    def search_vsm(self, query: str, k: int = 10) -> list[Hit]:
        terms, idfs, wqs, qnorm = SearchEngine._vsm_query(self, query)
        if not terms:
            return []
        conv, turn, score = self.shard.score_topk_vsm(terms, idfs, wqs, qnorm, k)
        return [Hit(c, int(t), float(s)) for c, t, s in zip(conv, turn, score)]

    def search_existential(self, query: str, k: int = 10) -> list[Hit]:
        terms = [t for t in analyze_query(query, self.analyzer_cfg) if self.df.get(t)]
        if not terms:
            return []
        conv, turn = self.shard.candidates_existential(terms, k)
        return [Hit(c, int(t), 1.0) for c, t in zip(conv, turn)]

    def search_phrase(self, query: str, k: int = 10) -> list[Hit]:
        pq = SearchEngine._phrase_query(self, query)
        if pq is None:
            return []
        stems, offsets, idfs = pq
        conv, turn, score = self.shard.phrase_topk(stems, offsets, idfs, k)
        return [Hit(c, int(t), float(s)) for c, t, s in zip(conv, turn, score)]
