"""Approximate distributed aggregates (mergeable sketches).

Top-k frequent terms over the documents table two ways:

* :func:`topk_terms_exact` — full ``groupby(term).sum`` then sort/limit
  (ground truth; SQL-verifiable). The shuffle moves one row per
  distinct (term, batch) thanks to per-batch counting.
* :func:`topk_terms_sketch` — per-batch **Misra-Gries** summaries of
  capacity m, summed with ``groupby(term).sum``. MG summaries are
  mergeable by addition (Agarwal et al., "Mergeable Summaries"): each
  batch's counts underestimate true batch counts by at most
  ``N_b/(m+1)``, so the summed estimate ``est`` satisfies
  ``true - N/(m+1) <= est <= true`` globally. Shuffle volume is capped
  at ``#batches × m`` rows no matter how many distinct terms exist —
  the point of the sketch at 100 TB scale, where the exact path's
  distinct-term set may not be shuffle-affordable.

Determinism: tie-break (count desc, term asc) on both paths and in the
SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.tokenize import batch_token_counts


def _batch_counts(batch: pa.Table) -> dict[str, int]:
    # vectorized: whole-column tokenize + one bincount over dictionary
    # codes; identical to summing Counter(tokenize(text)) per row
    toks, counts = batch_token_counts(batch["text"])
    return dict(zip(toks, counts.tolist()))


def misra_gries(counts: dict[str, int], capacity: int) -> dict[str, int]:
    """Reduce exact counts to an MG summary of ≤ ``capacity`` entries:
    repeatedly decrement all by the (capacity+1)-th largest count and
    drop non-positives (one vectorized step — equivalent to the
    streaming algorithm's final state for a given multiset)."""
    if len(counts) <= capacity:
        return dict(counts)
    vals = np.fromiter(counts.values(), np.int64, len(counts))
    # the (capacity+1)-th largest value is the decrement; at most
    # `capacity` entries can exceed it, and (capacity+1)·dec ≤ N_b gives
    # the N_b/(capacity+1) underestimation bound
    dec = np.partition(vals, len(vals) - capacity - 1)[len(vals) - capacity - 1]
    return {t: c - int(dec) for t, c in counts.items() if c > dec}


def topk_terms_exact(sf_dir: str, k: int = 50):
    """(term, count) of the k most frequent tokens (exact)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def rows(batch: pa.Table) -> pa.Table:
        counts = _batch_counts(batch)
        return pa.Table.from_pydict(
            {
                "term": pa.array(list(counts.keys()), pa.string()),
                "count": pa.array(list(counts.values()), pa.int64()),
            }
        )

    agg = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("count", alias_name="count"))
    )
    # distributed top-k: sort the aggregate in Ray (never holds the full
    # distinct-term table on the driver) and pull only k rows
    tab = agg.sort(["count", "term"], descending=[True, False]).limit(k).to_pandas()
    return tab.reset_index(drop=True)


def topk_terms_sketch(sf_dir: str, k: int = 50, capacity: int = 256):
    """Approximate top-k via summed per-batch Misra-Gries summaries.

    Estimates satisfy ``true - N/(capacity+1) <= est <= true``; any term
    whose true count exceeds the k-th count by more than N/(capacity+1)
    is guaranteed present. Output: (term, est_count)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def sketch_rows(batch: pa.Table) -> pa.Table:
        mg = misra_gries(_batch_counts(batch), capacity)
        return pa.Table.from_pydict(
            {
                "term": pa.array(list(mg.keys()), pa.string()),
                "est_count": pa.array(list(mg.values()), pa.int64()),
            }
        )

    agg = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(sketch_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("est_count", alias_name="est_count"))
    )
    tab = agg.sort(["est_count", "term"], descending=[True, False]).limit(k).to_pandas()
    return tab.reset_index(drop=True)
