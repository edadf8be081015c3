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


def stratified_sample(sf_dir: str, threshold_hex: str = "1999"):
    """Rows of ``documents`` kept iff md5(doc_id)[:4] <= threshold_hex
    (~fraction int(threshold_hex, 16)/65535; '1999' ≈ 10%). Returns
    (doc_id, source, lang)."""
    import ray.data as rd

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        mask = np.asarray(
            [_md5_prefix4(i) <= threshold_hex for i in ids], bool
        )
        return batch.filter(pa.array(mask))

    return (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "lang"]
        )
        .map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
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
