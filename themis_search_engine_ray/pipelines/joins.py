"""As-of join (a temporal operator Ray Data lacks natively).

``asof_join(left, right, by, on)``: for every left row, attach the
right row with the greatest ``on`` value ≤ the left's (backward
direction), within the same ``by`` key. Built as a composition the
Dataset API allows:

    tag-union the two inputs → ONE ``groupby(by)`` shuffle →
    ``map_groups``: sort the group's right side by ``on`` once,
    ``searchsorted`` every left row against it (vectorized).

Partitioning assumption (documented per the custom-operator contract):
one ``by`` key's rows fit in a worker group — the same assumption as
sessionization; pre-split hot keys by a coarse time bucket and stitch
at bucket boundaries if a key can exceed worker memory.

Demo entry: for each ``error`` event, the same user's most recent
``click`` at or before it — DuckDB verifies it with a native ASOF JOIN.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _tag_error_click(batch: pa.Table) -> pa.Table:
    """Shared probe/build tagging for the temporal joins: keep only
    error/click events, cast ts to int64 µs, mark errors as the left
    (probe) side. Vectorized (Arrow is_in/equal kernels, no row loop)."""
    import pyarrow.compute as pc

    sub = batch.filter(
        pc.is_in(batch["event_type"], value_set=pa.array(["error", "click"]))
    )
    return pa.Table.from_arrays(
        [
            sub["user_id"],
            sub["event_id"],
            sub["ts"].cast(pa.int64()),
            pc.equal(sub["event_type"], "error").cast(pa.int8()),
            sub["value"],
        ],
        names=["user_id", "event_id", "tus", "is_left", "value"],
    )


def _tagged_events(sf_dir: str):
    """events.parquet → tagged (user_id, event_id, tus, is_left, value)
    Dataset, column-pruned at the read."""
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    ).map_batches(_tag_error_click, batch_format="pyarrow", zero_copy_batch=True)


def asof_join_events(sf_dir: str):
    """(error event) ⟕asof (latest same-user click with ts ≤ error ts).

    Output: (event_id, user_id, ts_s, click_event_id, click_ts_s,
    click_value) — click columns null when the user has no prior click.
    Timestamps are epoch-seconds (int) for oracle comparability."""
    US = 1_000_000

    def join_group(group: pa.Table) -> pa.Table:
        is_left = group["is_left"].to_numpy().astype(bool)
        tus = group["tus"].to_numpy()
        eid = group["event_id"].to_numpy()
        val = group["value"].to_numpy()
        uid = int(group["user_id"][0].as_py())
        l_t, l_id = tus[is_left], eid[is_left]
        r_t, r_id, r_v = tus[~is_left], eid[~is_left], val[~is_left]
        order_l = np.argsort(l_t, kind="stable")
        l_t, l_id = l_t[order_l], l_id[order_l]
        order_r = np.lexsort((r_id, r_t))  # ties on ts: keep larger id last
        r_t, r_id, r_v = r_t[order_r], r_id[order_r], r_v[order_r]
        if l_t.size == 0:
            return pa.Table.from_pydict(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ts_s": pa.array([], pa.int64()),
                    "click_event_id": pa.array([], pa.int64()),
                    "click_ts_s": pa.array([], pa.int64()),
                    "click_value": pa.array([], pa.float64()),
                }
            )
        # index of latest right row with ts <= left ts (backward as-of)
        if r_t.size == 0:
            has = np.zeros(l_t.size, bool)
            cid = np.zeros(l_t.size, np.int64)
            cts = np.zeros(l_t.size, np.int64)
            cval = np.full(l_t.size, np.nan)
        else:
            pos = np.searchsorted(r_t, l_t, side="right") - 1
            has = pos >= 0
            cid = np.where(has, r_id[np.maximum(pos, 0)], -1)
            cts = np.where(has, r_t[np.maximum(pos, 0)], 0)
            cval = np.where(has, r_v[np.maximum(pos, 0)], np.nan)
        return pa.Table.from_pydict(
            {
                "event_id": pa.array(l_id),
                "user_id": pa.array(np.full(l_id.size, uid, np.int64)),
                "ts_s": pa.array(l_t // US),
                "click_event_id": pa.array(
                    [int(c) if h else None for c, h in zip(cid, has)], pa.int64()
                ),
                "click_ts_s": pa.array(
                    [int(c) // US if h else None for c, h in zip(cts, has)], pa.int64()
                ),
                "click_value": pa.array(
                    [float(v) if h else None for v, h in zip(cval, has)], pa.float64()
                ),
            }
        )

    return _tagged_events(sf_dir).groupby("user_id").map_groups(
        join_group, batch_format="pyarrow"
    )


def range_join_events(sf_dir: str, window_s: int = 300):
    """Range (interval) join: for every ``error`` event, aggregate the
    same user's ``click`` events with ts in the trailing window
    ``(error_ts - window_s, error_ts]``.

    The scale-right composition for an interval join with an aggregate
    on the build side: tag-union → ONE ``groupby(user_id)`` shuffle →
    per group, sort clicks by ts once, prefix-sum their values, then
    answer every error with two vectorized ``searchsorted`` probes
    (count = hi - lo, sum = P[hi] - P[lo]) — O((L+R)·log R) per key,
    never materializing the joined pairs. Same partitioning assumption
    as :func:`asof_join_events` (one user's rows fit a worker group;
    pre-split hot keys by coarse time bucket with a ``window_s``
    overlap and stitch).

    Output: (event_id, user_id, ts_s, n_clicks, sum_click_value) with
    sum rounded to 6 decimals for oracle comparability.
    """
    from ..functions.rounding import round_half_up

    US = 1_000_000
    w_us = window_s * US

    _OUT = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ts_s", pa.int64()),
            ("n_clicks", pa.int64()),
            ("sum_click_value", pa.float64()),
        ]
    )

    def join_group(group: pa.Table) -> pa.Table:
        is_left = group["is_left"].to_numpy().astype(bool)
        tus = group["tus"].to_numpy()
        eid = group["event_id"].to_numpy()
        val = group["value"].to_numpy()
        uid = int(group["user_id"][0].as_py())
        l_t, l_id = tus[is_left], eid[is_left]
        if l_t.size == 0:
            return pa.Table.from_pydict(
                {n: [] for n in _OUT.names}
            ).cast(_OUT)
        r_t = np.sort(tus[~is_left])
        r_v = np.nan_to_num(val[~is_left][np.argsort(tus[~is_left], kind="stable")])
        prefix = np.concatenate(([0.0], np.cumsum(r_v)))
        lo = np.searchsorted(r_t, l_t - w_us, side="right")
        hi = np.searchsorted(r_t, l_t, side="right")
        sums = prefix[hi] - prefix[lo]
        return pa.Table.from_pydict(
            {
                "event_id": l_id,
                "user_id": np.full(l_id.size, uid, np.int64),
                "ts_s": l_t // US,
                "n_clicks": (hi - lo).astype(np.int64),
                "sum_click_value": round_half_up(sums, 6),
            }
        ).cast(_OUT)

    return _tagged_events(sf_dir).groupby("user_id").map_groups(
        join_group, batch_format="pyarrow"
    )
