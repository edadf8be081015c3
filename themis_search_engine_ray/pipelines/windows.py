"""Windowed aggregates over the events stream table (Ray Data).

The reference has no streaming/window operators (SURVEY §2.11) — these
are part of the training-data-pipeline extension surface: batch
implementations of the window shapes a transcript/event pipeline needs,
built shuffle-consciously:

* tumbling window  — assign ``window = floor(ts / width)`` inside
  ``map_batches`` (vectorized timestamp arithmetic), then ONE
  ``groupby((window, event_type)).aggregate`` — the per-batch key
  assignment makes the shuffle rows tiny (int keys + value).
* sliding window   — each event replicated into the ``width/slide``
  windows that cover it (flat expansion inside the same batch UDF),
  then the identical groupby; replication factor is explicit and
  bounded.
* sessionization   — ``groupby(user_id).map_groups``: sort the user's
  events by ts, split where the gap exceeds the timeout, emit one row
  per session (classic transcript sessionization). Partitioning
  assumption: one user's events fit in one group — true by construction
  for bounded per-user activity; salt by day first if a user can exceed
  worker memory.

All flavors are DuckDB-SQL-expressible (epoch arithmetic / lag+cumsum
window functions), so the driver checks them value-exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EPOCH_US = 1_000_000


def _events(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def tumbling_counts(sf_dir: str, width_s: int = 3600):
    """Per (hour window, event_type): count + sum(value) + mean(value).

    window_start is epoch-seconds of the window's left edge."""
    from ray.data.aggregate import Count, Mean, Sum

    width_us = width_s * EPOCH_US

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()  # µs since epoch
        win = (ts // width_us) * width_s
        return pa.Table.from_arrays(
            [pa.array(win), batch["event_type"], batch["value"]],
            names=["window_start", "event_type", "value"],
        )

    return (
        _events(sf_dir, ["ts", "event_type", "value"])
        .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["window_start", "event_type"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value"),
            Mean("value", alias_name="avg_value"),
        )
    )


def sliding_counts(sf_dir: str, width_s: int = 3600, slide_s: int = 900):
    """Sliding windows: every window of ``width_s`` advancing by
    ``slide_s`` that covers the event (width/slide replicas per event)."""
    from ray.data.aggregate import Count, Sum

    assert width_s % slide_s == 0
    reps = width_s // slide_s
    slide_us = slide_s * EPOCH_US

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        last = ts // slide_us  # last slide-aligned window containing the event
        starts = (
            last[:, None] - np.arange(reps, dtype=np.int64)[None, :]
        ).ravel() * slide_s
        vals = np.repeat(batch["value"].to_numpy(), reps)
        keep = starts >= 0  # drop windows starting before the epoch
        return pa.Table.from_arrays(
            [pa.array(starts[keep]), pa.array(vals[keep])],
            names=["window_start", "value"],
        )

    return (
        _events(sf_dir, ["ts", "value"])
        .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("window_start")
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )


def sessionize(sf_dir: str, gap_s: int = 1800):
    """Per-user sessions split at inactivity gaps > ``gap_s``: one row
    per session with start/end epoch-seconds, event count, value sum."""
    gap_us = gap_s * EPOCH_US

    def sessions(group: pa.Table) -> pa.Table:
        uid = int(group["user_id"][0].as_py())
        ts = group["ts"].cast(pa.int64()).to_numpy()
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        val = group["value"].to_numpy()[order]
        new = np.empty(ts.size, bool)
        new[0] = True
        new[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new) - 1
        n_sessions = int(sid[-1]) + 1
        starts = ts[new]
        ends = np.maximum.reduceat(ts, np.flatnonzero(new))
        counts = np.bincount(sid, minlength=n_sessions)
        sums = np.bincount(sid, weights=val, minlength=n_sessions)
        return pa.Table.from_arrays(
            [
                pa.array(np.full(n_sessions, uid, np.int64)),
                pa.array(np.arange(n_sessions, dtype=np.int64)),
                pa.array(starts // EPOCH_US),
                pa.array(ends // EPOCH_US),
                pa.array(counts.astype(np.int64)),
                pa.array(sums),
            ],
            names=[
                "user_id",
                "session_idx",
                "session_start",
                "session_end",
                "n_events",
                "sum_value",
            ],
        )

    return (
        _events(sf_dir, ["user_id", "ts", "value"])
        .groupby("user_id")
        .map_groups(sessions, batch_format="pyarrow")
    )
