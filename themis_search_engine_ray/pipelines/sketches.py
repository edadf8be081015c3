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

:func:`distinct_terms_hll` adds the cardinality member of the family:
per-batch HyperLogLog registers (Flajolet et al. 2007) merged with one
``groupby(idx).max`` — max-mergeable like MG is sum-mergeable.
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


# Sentinel terms carrying per-batch metadata through the same shuffle
# as the sketch rows ("\x00" sorts before any real token and can never
# be produced by the tokenizer). Summed, `total` yields the global N
# the MG error bound N/(capacity+1) needs; `dropped` counts batches
# whose summary actually pruned terms (0 total ⇒ the candidate set is
# the complete term set, so a <k result is certifiably complete).
_TOTAL_SENTINEL = "\x00total"
_DROPPED_SENTINEL = "\x00dropped"


def topk_terms_sketch(
    sf_dir: str,
    k: int = 50,
    capacity: int = 256,
    refine: bool = True,
    cand_cap: "int | None" = None,
):
    """Top-k frequent terms via per-batch Misra-Gries candidate pruning.

    ``refine=True`` (default): the summed sketch selects a bounded
    candidate set — ≤ #batches × capacity terms through the SHUFFLE,
    then capped to ``max(64k, 4096)`` by a distributed sort+limit before
    anything reaches the driver (the collect is O(cand_cap) at any
    corpus size; truncation is folded into the certification) — then
    a second scan re-counts ONLY candidate terms exactly (broadcast
    frozenset membership, tiny groupby) and returns the exact top-k
    (term, count). A term absent from every batch summary has true
    count ≤ N/(capacity+1) (Agarwal et al., mergeable summaries), so
    whenever the exact k-th count exceeds that bound the result equals
    the true top-k — the guarantee is checked against the true N
    (carried through the sketch shuffle as a sentinel row) and a
    ``UserWarning`` is raised if it cannot be certified.

    ``refine=False``: one pass, returns the raw summed-sketch estimates
    (term, est_count) with ``true - N/(capacity+1) <= est <= true``.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    def sketch_rows(batch: pa.Table) -> pa.Table:
        counts = _batch_counts(batch)
        mg = misra_gries(counts, capacity)
        terms = list(mg.keys()) + [_TOTAL_SENTINEL, _DROPPED_SENTINEL]
        vals = list(mg.values()) + [
            int(sum(counts.values())),
            int(len(mg) < len(counts)),
        ]
        return pa.Table.from_pydict(
            {
                "term": pa.array(terms, pa.string()),
                "est_count": pa.array(vals, pa.int64()),
            }
        )

    reader = lambda: rd.read_parquet(  # noqa: E731
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    agg = (
        reader()
        .map_batches(sketch_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("est_count", alias_name="est_count"))
    )

    def drop_sentinel(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.invert(
                pc.is_in(
                    batch["term"],
                    value_set=pa.array([_TOTAL_SENTINEL, _DROPPED_SENTINEL]),
                )
            )
        )

    if not refine:
        tab = (
            agg.map_batches(drop_sentinel, batch_format="pyarrow")
            .sort(["est_count", "term"], descending=[True, False])
            .limit(k)
            .to_pandas()
        )
        return tab.reset_index(drop=True)

    agg = agg.materialize()  # consumed twice: sentinels + candidates
    import pyarrow.compute as pc

    sent_tab = agg.map_batches(
        lambda t: t.filter(
            pc.is_in(
                t["term"], value_set=pa.array([_TOTAL_SENTINEL, _DROPPED_SENTINEL])
            )
        ),
        batch_format="pyarrow",
    ).to_pandas()  # exactly ≤ 2 rows
    n_total = int(sent_tab.loc[sent_tab["term"] == _TOTAL_SENTINEL, "est_count"].sum())
    n_dropped_batches = int(
        sent_tab.loc[sent_tab["term"] == _DROPPED_SENTINEL, "est_count"].sum()
    )
    # the summed-sketch candidate union grows with #batches; cap what
    # reaches the driver DISTRIBUTEDLY (sort + limit) so the collect is
    # O(cand_cap) at any corpus size. Truncation weakens certification
    # (a dropped candidate's true count ≤ its est ≤ the boundary est,
    # + the global MG bound) — accounted for below.
    if cand_cap is None:
        cand_cap = max(64 * k, 4096)
    # fetch cand_cap + 1 rows so "exactly cand_cap candidates exist" is
    # distinguishable from actual truncation (no spurious warning)
    cand_tab = (
        agg.map_batches(drop_sentinel, batch_format="pyarrow")
        .sort(["est_count", "term"], descending=[True, False])
        .limit(cand_cap + 1)
        .to_pandas()
    )
    truncated = len(cand_tab) > cand_cap
    cand_tab = cand_tab.iloc[:cand_cap]
    est_boundary = int(cand_tab["est_count"].iloc[-1]) if truncated else 0
    cand = frozenset(cand_tab["term"])
    cand_ref = ray.put(cand)

    def exact_rows(batch: pa.Table) -> pa.Table:
        keep = ray.get(cand_ref)
        counts = _batch_counts(batch)
        items = [(t, c) for t, c in counts.items() if t in keep]
        return pa.Table.from_pydict(
            {
                "term": pa.array([t for t, _ in items], pa.string()),
                "count": pa.array([c for _, c in items], pa.int64()),
            }
        )

    exact = (
        reader()
        .map_batches(exact_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("count", alias_name="count"))
    )
    tab = (
        exact.sort(["count", "term"], descending=[True, False]).limit(k).to_pandas()
    ).reset_index(drop=True)

    bound = n_total / (capacity + 1)
    kth = int(tab["count"].iloc[-1]) if len(tab) else 0
    # Not certified when (a) we returned k terms but the k-th does not
    # beat the MG drop bound, (b) we returned FEWER than k terms and
    # some batch summary actually pruned terms (when none did, the
    # candidate set is the complete term set and <k rows just means
    # fewer than k distinct terms exist), or (c) the candidate cap
    # truncated the summed sketch and a dropped candidate (true count
    # ≤ boundary est + global MG bound) could beat the k-th.
    if (
        (len(tab) == k and kth <= bound)
        or (len(tab) < k and n_dropped_batches > 0)
        or (truncated and kth <= est_boundary + bound)
    ):
        import warnings

        warnings.warn(
            f"topk_terms_sketch: returned {len(tab)} terms, k-th count "
            f"{kth} vs MG bound N/(capacity+1) = {bound:.1f}; top-{k} not "
            f"certified exact — raise capacity",
            UserWarning,
            stacklevel=2,
        )
    return tab


# ------------------------------------------------------- HyperLogLog

_HLL_P = 12  # 4096 registers, stderr ~ 1.04/sqrt(4096) = 1.6%


def _hll_registers(tokens: list[str], p: int = _HLL_P) -> np.ndarray:
    """Dense HLL register array for a token list (vectorized rho).

    64-bit hash per UNIQUE token (memoized blake2b — the same policy as
    the stem cache: Python touches unique strings only); top ``p`` bits
    pick the register, the rank of the highest set bit in the remaining
    ``64-p`` bits (from the top) is the register value."""
    m = 1 << p
    regs = np.zeros(m, np.int8)
    if not tokens:
        return regs
    hs = np.fromiter(
        (_hll_hash(t) for t in tokens), np.uint64, len(tokens)
    )
    idx = (hs >> np.uint64(64 - p)).astype(np.int64)
    w = hs & np.uint64((1 << (64 - p)) - 1)
    # rho = #leading zeros of the (64-p)-bit suffix + 1, via an EXACT
    # vectorized integer bit_length (float log2 rounds up for suffixes
    # within an ulp below a power of two — e.g. w = 2^52 - 1 — recording
    # rho-1 / "unseen" for those hashes)
    rho = np.full(len(hs), 64 - p + 1, np.int8)
    nz = w > 0
    rho[nz] = (64 - p + 1 - _bit_length_u64(w[nz])).astype(np.int8)
    np.maximum.at(regs, idx, rho)
    return regs


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Exact ``int.bit_length`` over a uint64 array (binary reduction;
    6 vectorized passes, no float rounding)."""
    v = v.astype(np.uint64, copy=True)
    n = np.zeros(v.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(s))
        n[m] += s
        v[m] >>= np.uint64(s)
    return n + (v > 0)


_HLL_HASH_CACHE: dict[str, int] = {}


def _hll_hash(t: str) -> int:
    h = _HLL_HASH_CACHE.get(t)
    if h is None:
        import hashlib

        h = int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
        )
        if len(_HLL_HASH_CACHE) < 1_000_000:
            _HLL_HASH_CACHE[t] = h
    return h


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator (Flajolet et al. 2007) with the
    linear-counting small-range correction."""
    m = regs.size
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def distinct_terms_hll(sf_dir: str, p: int = _HLL_P):
    """Approximate DISTINCT-TERM count over the documents table.

    Per-batch dense HLL registers → sparse (idx, val) rows (nonzero
    only) → ``groupby(idx).max`` — registers are mergeable by
    elementwise max, so the shuffle carries at most #batches × m tiny
    int rows no matter how many distinct terms exist (the 100 TB story:
    the exact path's full term shuffle vs a few KB of registers).
    Returns a one-row DataFrame (n_distinct_est, precision, stderr).
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Max

    def reg_rows(batch: pa.Table) -> pa.Table:
        toks, _ = batch_token_counts(batch["text"])
        regs = _hll_registers(toks, p)
        nz = np.flatnonzero(regs)
        return pa.Table.from_pydict(
            {
                "idx": nz.astype(np.int64),
                "val": regs[nz].astype(np.int64),
            }
        )

    merged = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(reg_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("idx")
        .aggregate(Max("val", alias_name="val"))
        .to_pandas()  # <= 2^p rows
    )
    regs = np.zeros(1 << p, np.int8)
    if len(merged):
        regs[merged["idx"].to_numpy()] = merged["val"].to_numpy()
    return pd.DataFrame(
        {
            "n_distinct_est": [int(round(hll_estimate(regs)))],
            "precision": [p],
            "stderr_pct": [round(104.0 / (1 << p) ** 0.5, 2)],
        }
    )
