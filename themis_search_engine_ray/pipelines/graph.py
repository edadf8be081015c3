"""Iterative graph analytics on Ray Data (PageRank).

The reference ships a PageRank that never ran: ``Graph.java:34-203``
builds an adjacency skeleton and ``PageRank.java:48-146`` never fills
the matrix nor iterates (SURVEY §2.10 — abandoned). This module is a
WORKING distributed replacement with the standard dataflow shape:

    ranks(node, r) ⋈ edges(src, dst, outdeg)  →  contribution r/outdeg
      to dst → groupby(dst).sum  →  r' = (1-d)/N + d·(Σ contrib)

The per-iteration join is a REDUCE-SIDE join via tag-union — edge rows
(key=src) and rank rows (key=node) union into one dataset and a single
``groupby(key).map_groups`` pairs each node's rank with its out-edges
(the same pattern as pipelines/joins.py's as-of join; Ray 2.49's hash
Dataset.join mis-resolves key columns when executed repeatedly in a
loop, so iterative algorithms here avoid it). The shuffle carries
(key, int, float) rows only. Out-degrees are computed once and attached
to the edge list up front. Fixed iteration count (deterministic
dataflow; float sums are distributed, so ranks are reproducible to
~1e-15 — the pytest oracle compares against a numpy power iteration at
1e-9).

``symmetric=True`` (e.g. an undirected similarity graph fed as both
edge directions) skips the dangling-mass correction and the
zero-in-degree fill: every node then has in- and out-edges, so both are
provably no-ops and each iteration is exactly one join + one groupby.
With ``symmetric=False`` dangling mass redistributes uniformly (scalar
aggregates, no extra shuffle) and isolated-in-degree nodes receive the
base + dangling share via a zero-contribution union.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.rounding import round_half_up

_NODE_SCHEMA = pa.schema([("node", pa.int64())])
_RANK_SCHEMA = pa.schema([("node", pa.int64()), ("rank", pa.float64())])
_C_SCHEMA = pa.schema([("node", pa.int64()), ("c", pa.float64())])


def pagerank(edges, damping: float = 0.85, n_iter: int = 20, symmetric: bool = False):
    """PageRank over a directed edge Dataset (src:int64, dst:int64).

    Returns a Dataset (node, rank); nodes = every id appearing as src
    or dst. Fixed ``n_iter`` power iterations.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ray.data.aggregate import Sum

    edges = edges.materialize()

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": np.concatenate(
                    (batch["src"].to_numpy(), batch["dst"].to_numpy())
                )
            }
        ).cast(_NODE_SCHEMA)

    nodes = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .count()
        .select_columns(["node"])
        .materialize()
    )
    n = nodes.count()
    if n == 0:
        return nodes

    # out-degree needs no precomputation at all: the per-iteration
    # group for key=src holds ALL of src's out-edges, so outdeg is just
    # the group's edge-row count
    _UNION_SCHEMA = pa.schema(
        [
            ("key", pa.int64()),
            ("dst", pa.int64()),
            ("rank", pa.float64()),
            ("is_rank", pa.int8()),
        ]
    )

    def edge_rows(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy()
        return pa.Table.from_pydict(
            {
                "key": src,
                "dst": batch["dst"].to_numpy(),
                "rank": np.zeros(src.size, np.float64),
                "is_rank": np.zeros(src.size, np.int8),
            }
        ).cast(_UNION_SCHEMA)

    tagged_edges = edges.map_batches(
        edge_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def init_ranks(batch: pa.Table) -> pa.Table:
        nd = batch["node"].to_numpy()
        return pa.Table.from_pydict(
            {"node": nd, "rank": np.full(nd.size, 1.0 / n, np.float64)}
        ).cast(_RANK_SCHEMA)

    ranks = nodes.map_batches(
        init_ranks, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    base = (1.0 - damping) / n

    def rank_rows(batch: pa.Table) -> pa.Table:
        nd = batch["node"].to_numpy()
        return pa.Table.from_pydict(
            {
                "key": nd,
                "dst": np.full(nd.size, -1, np.int64),
                "rank": batch["rank"].to_numpy(),
                "is_rank": np.ones(nd.size, np.int8),
            }
        ).cast(_UNION_SCHEMA)

    def send_contribs(group: pa.Table) -> pa.Table:
        is_rank = group["is_rank"].to_numpy()
        ridx = np.flatnonzero(is_rank == 1)
        eidx = np.flatnonzero(is_rank == 0)
        if ridx.size == 0 or eidx.size == 0:
            return pa.Table.from_pydict({"node": [], "c": []}).cast(_C_SCHEMA)
        r = float(group["rank"][int(ridx[0])].as_py())
        return pa.Table.from_pydict(
            {
                "node": group["dst"].to_numpy()[eidx],
                "c": np.full(eidx.size, r / eidx.size, np.float64),
            }
        ).cast(_C_SCHEMA)

    def zero_rows(batch: pa.Table) -> pa.Table:
        nd = batch["node"].to_numpy()
        return pa.Table.from_pydict(
            {"node": nd, "c": np.zeros(nd.size, np.float64)}
        ).cast(_C_SCHEMA)

    for _ in range(n_iter):
        tagged = tagged_edges.union(
            ranks.map_batches(rank_rows, batch_format="pyarrow")
        )
        summed = tagged.groupby("key").map_groups(
            send_contribs, batch_format="pyarrow"
        )
        if not symmetric:
            # nodes with no in-edges still need a row (base + dangling)
            summed = summed.union(
                nodes.map_batches(
                    zero_rows, batch_format="pyarrow", zero_copy_batch=True
                )
            )
        all_c = (
            summed.groupby("node").aggregate(Sum("c", alias_name="c")).materialize()
        )

        if symmetric:
            dshare = 0.0
        else:
            # dangling mass, join-free: every src WITH out-edges
            # distributes its whole rank across its edges, so
            # Σ contributions = rank mass held by linked nodes; the
            # dangling mass is the total minus that (two scalar
            # aggregates, no shuffle)
            total_mass = ranks.aggregate(Sum("rank", alias_name="s"))["s"] or 0.0
            linked_mass = all_c.aggregate(Sum("c", alias_name="s"))["s"] or 0.0
            dshare = damping * (total_mass - linked_mass) / n

        def apply_rank(batch: pa.Table, dshare=dshare) -> pa.Table:
            return pa.Table.from_pydict(
                {
                    "node": batch["node"],
                    "rank": base + dshare + damping * batch["c"].to_numpy(),
                }
            ).cast(_RANK_SCHEMA)

        ranks = all_c.map_batches(apply_rank, batch_format="pyarrow").materialize()

    return ranks


def pagerank_citations_table(sf_dir: str, n_iter: int = 6, damping: float = 0.85):
    """Driver entry for the FULL citation path with the J4 semi-join:
    synthetic deterministic citation JSONL over the documents table →
    S4 parse (blank-on-malformed) → vectorized edge emission → corpus
    semi-join (drop phantom targets, ``PageRank.java:98-105``) →
    directed PageRank with dangling-mass redistribution. Returns
    (doc_id, rank) rounded to 6 — value-exact against the unrolled
    grouped-CTE DuckDB oracle (__ray_entry__._pagerank_citations_sql)."""
    from ..sources.citations import pagerank_citations, synthesize_citations_jsonl

    path = synthesize_citations_jsonl(sf_dir)
    ranks = pagerank_citations(
        path, n_iter=n_iter, damping=damping, corpus_only=True
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch["node"],
                "rank": round_half_up(batch["rank"].to_numpy(), 6),
            }
        )

    return ranks.map_batches(finish, batch_format="pyarrow")


def pagerank_dup_graph(sf_dir: str, threshold: float = 0.5, n_iter: int = 6):
    """Driver entry: PageRank centrality over the (symmetric) near-dup
    pair graph of the documents table — (doc_id, rank) rounded to 6 for
    every doc that appears in at least one verified pair."""
    from .dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(sf_dir, threshold).select_columns(["a", "b"])

    def sym(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        return pa.Table.from_pydict(
            {"src": np.concatenate((a, b)), "dst": np.concatenate((b, a))}
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow")
    ranks = pagerank(edges, n_iter=n_iter, symmetric=True)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch["node"],
                "rank": round_half_up(batch["rank"].to_numpy(), 6),
            }
        )

    return ranks.map_batches(finish, batch_format="pyarrow")
