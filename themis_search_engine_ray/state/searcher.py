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

from ..functions.analyzer import AnalyzerConfig, analyze_query
from ..functions.bm25 import idf as bm25_idf
from ..functions.bm25 import term_score
from ..pipelines.index_build import load_meta
from ..stages.codec import all_tfs, decode_all_docs, skips_from_bytes


@dataclass
class Hit:
    conv_id: str
    turn_idx: int
    score: float


class ShardIndex:
    """In-process view of one or more salt shards of the index."""

    def __init__(self, index_dir: str, salts: list[int]):
        meta = load_meta(index_dir)
        self.meta = meta
        self.avgdl = float(meta["avgdl"])
        self.salts = sorted(salts)
        term_parts = int(meta["term_parts"])
        want = set(self.salts)

        self.tables = []
        self.runs: dict[str, list[tuple[int, int]]] = {}
        part_root = os.path.join(index_dir, "partitions")
        for pdir in sorted(os.listdir(part_root)):
            seg_dir = os.path.join(part_root, pdir, "segments")
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
                ti = len(self.tables)
                self.tables.append(tab)
                for row, term in enumerate(tab["term"].to_pylist()):
                    self.runs.setdefault(term, []).append((ti, row))

        # doc_stats for these salt ranges, sorted by doc_id
        frames = []
        for pdir in sorted(os.listdir(part_root)):
            ds_dir = os.path.join(part_root, pdir, "doc_stats")
            if not os.path.isdir(ds_dir):
                continue
            for s in self.salts:
                sdir = os.path.join(ds_dir, f"salt={s}")
                if os.path.isdir(sdir):
                    frames.append(
                        pads.dataset(sdir, format="parquet").to_table(
                            columns=["doc_id", "conv_id", "turn_idx", "dl"]
                        )
                    )
        if frames:
            import pyarrow as pa

            stats = pa.concat_tables(frames)
            ids = stats["doc_id"].to_numpy().astype(np.uint64)
            order = np.argsort(ids, kind="stable")
            self.doc_ids = ids[order]
            self.dl = stats["dl"].to_numpy().astype(np.float64)[order]
            self.conv = np.asarray(stats["conv_id"].to_pylist(), dtype="U")[order]
            self.turn = stats["turn_idx"].to_numpy().astype(np.int32)[order]
        else:
            self.doc_ids = np.empty(0, np.uint64)
            self.dl = np.empty(0, np.float64)
            self.conv = np.empty(0, dtype="U1")
            self.turn = np.empty(0, np.int32)

    def df_local(self, term: str) -> int:
        return sum(
            int(self.tables[ti]["df"][row].as_py()) for ti, row in self.runs.get(term, [])
        )

    def _decode_run(self, ti: int, row: int):
        tab = self.tables[ti]
        skips = skips_from_bytes(tab["skips"][row].as_buffer())
        ids = decode_all_docs(tab["docs"][row].as_buffer(), skips)
        tfs = all_tfs(tab["tfs"][row].as_buffer())
        return ids, tfs

    def score_topk(self, terms: list[str], idfs: list[float], k: int):
        """Exact shard-local top-k. ``terms`` must be ascending (the
        canonical accumulation order shared with the oracle)."""
        id_chunks, sc_chunks = [], []
        for term, t_idf in zip(terms, idfs):
            for ti, row in self.runs.get(term, ()):
                ids, tfs = self._decode_run(ti, row)
                if ids.size == 0:
                    continue
                pos = np.searchsorted(self.doc_ids, ids)
                dl = self.dl[pos]
                sc_chunks.append(term_score(tfs, dl, self.avgdl, t_idf))
                id_chunks.append(ids)
        if not id_chunks:
            return [], [], []
        cand = np.concatenate(id_chunks)
        contrib = np.concatenate(sc_chunks)
        uniq, inv = np.unique(cand, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(acc, inv, contrib)  # sequential adds in term-asc order
        pos = np.searchsorted(self.doc_ids, uniq)
        conv = self.conv[pos]
        turn = self.turn[pos]
        order = np.lexsort((turn, conv, -acc))[: min(k, acc.size)]
        return conv[order].tolist(), turn[order].tolist(), acc[order].tolist()


class ShardSearcher:
    """Ray actor holding one or more shards (created via .remote)."""

    def __init__(self, index_dir: str, salts: list[int]):
        self.shard = ShardIndex(index_dir, salts)

    def score_topk(self, terms, idfs, k):
        return self.shard.score_topk(terms, idfs, k)

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

        # global term df directory (small; dict lookup like the
        # reference's in-RAM vocabulary, but df-only — offsets are gone)
        ts_dir = os.path.join(index_dir, "term_stats")
        self.df: dict[str, int] = {}
        if os.path.isdir(ts_dir):
            tab = pads.dataset(ts_dir, format="parquet").to_table()
            self.df = dict(
                zip(tab["term"].to_pylist(), (int(x) for x in tab["df"].to_pylist()))
            )

        num_actors = min(num_actors or num_shards, num_shards)
        groups = [list(range(num_shards))[i::num_actors] for i in range(num_actors)]
        actor_cls = ray.remote(ShardSearcher)
        self.actors = [
            actor_cls.remote(index_dir, salts) for salts in groups if salts
        ]
        ray.get([a.ready.remote() for a in self.actors])

    def search(self, query: str, k: int = 10) -> list[Hit]:
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
        parts = ray.get([a.score_topk.remote(terms, idfs, k) for a in self.actors])
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
        tab = pads.dataset(ts_dir, format="parquet").to_table()
        self.df = dict(
            zip(tab["term"].to_pylist(), (int(x) for x in tab["df"].to_pylist()))
        )

    def search(self, query: str, k: int = 10) -> list[Hit]:
        terms_all = analyze_query(query, self.analyzer_cfg)
        terms, idfs = [], []
        for t in terms_all:
            df = self.df.get(t)
            if df:
                terms.append(t)
                idfs.append(bm25_idf(float(self.n_docs), df))
        if not terms:
            return []
        conv, turn, score = self.shard.score_topk(terms, idfs, k)
        return [Hit(c, int(t), float(s)) for c, t, s in zip(conv, turn, score)]
