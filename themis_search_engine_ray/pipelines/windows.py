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
* sessionization   — SALTED two-level ``groupby``: local sessions per
  ``(user_id, time-bucket)``, then a per-user merge of the session
  SUMMARIES across bucket boundaries (see :func:`sessionize`). A hot
  user's events spread over one group per bucket; only their compact
  session summaries meet in one place.

All flavors are DuckDB-SQL-expressible (epoch arithmetic / lag+cumsum
window functions), so the driver checks them value-exactly.

Fixed-point-exact aggregation (``decimals``, default 2): the events
fixture's ``value`` column is fixed-point with 2 decimals, so sums run
over scaled int64 — EXACT and independent of accumulation order, which
float sums are not (a 10x-scale spot check caught a 1-ulp avg_value
flip between Ray's block-order partial sums and DuckDB's scan-order
sum — the classic float-reduction reproducibility trap; integer cents
make the result identical on any engine, any partitioning, any
re-run). Pass ``decimals=None`` for raw float semantics on
arbitrary-precision or NULL-bearing values — the fixed-point path
REJECTS (clear ValueError, no silent fallback) values that are not
fixed-point at the given scale or are NULL, because a per-batch float
fallback would silently forfeit the exactness contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EPOCH_US = 1_000_000


def _scaled_int(col, decimals: int) -> np.ndarray:
    """value → exact scaled int64 (values must be fixed-point with at
    most ``decimals`` decimals and non-NULL; asserted within float
    tolerance). Violations raise a ValueError naming the remedy
    (``decimals=None``) rather than silently degrading — the
    fixed-point contract is what makes the aggregates
    accumulation-order-exact, so a quiet float fallback in SOME batches
    would be worse than an error."""
    if col.null_count:
        raise ValueError(
            f"value column has {col.null_count} NULLs; fixed-point "
            "aggregation (decimals=N) requires non-NULL values — pass "
            "decimals=None for null-skipping float aggregation"
        )
    v = col.to_numpy() * (10.0**decimals)
    r = np.round(v)
    # RELATIVE tolerance: the float64 representation error of a valid
    # fixed-point value scales with its magnitude (an absolute 1e-6
    # would spuriously reject 2-decimal values above ~4.5e7)
    if v.size and (np.abs(v - r) > 1e-9 * np.maximum(1.0, np.abs(v))).any():
        raise ValueError(
            f"value column is not fixed-point with {decimals} decimals; "
            "pass decimals=None for float aggregation"
        )
    return r.astype(np.int64)


def _events(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def tumbling_counts(sf_dir: str, width_s: int = 3600, decimals: "int | None" = 2):
    """Per (hour window, event_type): count + sum(value) + mean(value).

    window_start is epoch-seconds of the window's left edge."""
    from ray.data.aggregate import Count, Mean, Sum

    width_us = width_s * EPOCH_US
    scale = None if decimals is None else 10.0**decimals

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()  # µs since epoch
        win = (ts // width_us) * width_s
        val = (
            batch["value"]
            if scale is None
            else pa.array(_scaled_int(batch["value"], decimals))
        )
        return pa.Table.from_arrays(
            [pa.array(win), batch["event_type"], val],
            names=["window_start", "event_type", "value"],
        )

    # fixed-point path: avg is rebuilt from the exact integer sum in
    # unscale, so don't pay for a Mean accumulator through the shuffle
    aggs = [Count(alias_name="n_events"), Sum("value", alias_name="sum_value")]
    if scale is None:
        aggs.append(Mean("value", alias_name="avg_value"))
    agg = (
        _events(sf_dir, ["ts", "event_type", "value"])
        .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["window_start", "event_type"])
        .aggregate(*aggs)
    )
    if scale is None:
        return agg

    def unscale(batch: pa.Table) -> pa.Table:
        s = batch["sum_value"].to_numpy().astype(np.float64) / scale
        n = batch["n_events"].to_numpy()
        return pa.Table.from_arrays(
            [
                batch["window_start"],
                batch["event_type"],
                batch["n_events"],
                pa.array(s),
                pa.array(s / n),  # ONE division: same IEEE op as the oracle
            ],
            names=["window_start", "event_type", "n_events", "sum_value", "avg_value"],
        )

    return agg.map_batches(unscale, batch_format="pyarrow", zero_copy_batch=True)


def sliding_counts(
    sf_dir: str,
    width_s: int = 3600,
    slide_s: int = 900,
    decimals: "int | None" = 2,
):
    """Sliding windows: every window of ``width_s`` advancing by
    ``slide_s`` that covers the event (width/slide replicas per event)."""
    from ray.data.aggregate import Count, Sum

    assert width_s % slide_s == 0
    reps = width_s // slide_s
    slide_us = slide_s * EPOCH_US
    scale = None if decimals is None else 10.0**decimals

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        last = ts // slide_us  # last slide-aligned window containing the event
        starts = (
            last[:, None] - np.arange(reps, dtype=np.int64)[None, :]
        ).ravel() * slide_s
        vals = (
            batch["value"].to_numpy()
            if scale is None
            else _scaled_int(batch["value"], decimals)
        )
        vals = np.repeat(vals, reps)
        keep = starts >= 0  # drop windows starting before the epoch
        return pa.Table.from_arrays(
            [pa.array(starts[keep]), pa.array(vals[keep])],
            names=["window_start", "value"],
        )

    agg = (
        _events(sf_dir, ["ts", "value"])
        .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("window_start")
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    if scale is None:
        return agg

    def unscale(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("sum_value"),
            "sum_value",
            pa.array(batch["sum_value"].to_numpy().astype(np.float64) / scale),
        )

    return agg.map_batches(unscale, batch_format="pyarrow", zero_copy_batch=True)


def sessionize(
    sf_dir: str,
    gap_s: int = 1800,
    decimals: "int | None" = 2,
    salt_s: int = 86400,
):
    """Per-user sessions split at inactivity gaps > ``gap_s``: one row
    per session with start/end epoch-seconds, event count, value sum.

    SALTED two-level shape (the hot-user fix): level 1 groups by
    ``(user_id, ts // salt_s)`` — a bot with months of events spreads
    over one group per ``salt_s`` bucket instead of landing whole in a
    single ``map_groups`` call — and computes LOCAL sessions per
    bucket; level 2 groups the per-session SUMMARIES (5 fixed-width
    columns, not events) by user and merges sessions that span bucket
    boundaries (two summaries merge iff ``next.start - prev.end <=
    gap_s`` — exactly the event-gap rule, because the boundary summary
    endpoints ARE the adjacent event timestamps). The result is
    identical to the unsalted computation for ANY salt: pytest asserts
    salted == single-bucket == a brute-force reference on a hot user
    whose sessions cross day boundaries.

    Remaining partition assumption (far weaker than one-user-one-
    group): one user's session SUMMARIES fit one level-2 group. A user
    with continuous activity collapses to ≤ span/salt_s + 1 summaries;
    only a user with ~#events distinct sessions keeps level 2 O(events)
    — at 40 B/summary vs full event rows, orders of magnitude smaller.

    Fixed-point mode carries scaled int64 sums through BOTH levels and
    divides once per merged session, so the output is bit-identical to
    the unsalted/oracle computation regardless of how sessions were
    split across buckets. Float mode (``decimals=None``) merges float
    partial sums — same within-ulp caveat as any float reduction."""
    gap_us = gap_s * EPOCH_US
    salt_us = salt_s * EPOCH_US
    scale = None if decimals is None else 10.0**decimals

    def tag(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        if scale is None:
            val = batch["value"].to_numpy().astype(np.float64)
        else:
            val = _scaled_int(batch["value"], decimals).astype(np.float64)
        return pa.Table.from_pydict(
            {
                "user_id": batch["user_id"],
                "salt": ts // salt_us,
                "ts": ts,
                # float64 carrier for both modes: scaled ints are exact
                # in float64 well under 2^53 (asserted in local_sessions)
                "value": val,
            }
        )

    def local_sessions(group: pa.Table) -> pa.Table:
        ts = group["ts"].to_numpy()
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        val = group["value"].to_numpy()[order]
        new = np.empty(ts.size, bool)
        new[0] = True
        new[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new) - 1
        n_sessions = int(sid[-1]) + 1
        idx = np.flatnonzero(new)
        sums = np.bincount(sid, weights=val, minlength=n_sessions)
        if scale is not None:
            # exactness guard for the float64 carrier of scaled cents
            assert np.abs(sums).max(initial=0.0) < 2.0**53
        return pa.Table.from_pydict(
            {
                "user_id": group["user_id"].take(pa.array(idx)),
                "start_us": ts[idx],
                "end_us": np.maximum.reduceat(ts, idx),
                "n_events": np.bincount(sid, minlength=n_sessions).astype(
                    np.int64
                ),
                "sum_val": sums,
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        uid = int(group["user_id"][0].as_py())
        starts = group["start_us"].to_numpy()
        order = np.argsort(starts, kind="stable")
        starts = starts[order]
        ends = group["end_us"].to_numpy()[order]
        n = group["n_events"].to_numpy()[order]
        sv = group["sum_val"].to_numpy()[order]
        new = np.empty(starts.size, bool)
        new[0] = True
        new[1:] = (starts[1:] - ends[:-1]) > gap_us
        idx = np.flatnonzero(new)
        n_sessions = idx.size
        sums = np.add.reduceat(sv, idx)
        if scale is not None:
            # merged cents stay exact integers in float64
            assert np.abs(sums).max(initial=0.0) < 2.0**53
            sums = sums / scale  # ONE division: same IEEE op as the oracle
        return pa.Table.from_arrays(
            [
                pa.array(np.full(n_sessions, uid, np.int64)),
                pa.array(np.arange(n_sessions, dtype=np.int64)),
                pa.array(starts[idx] // EPOCH_US),
                pa.array(np.maximum.reduceat(ends, idx) // EPOCH_US),
                pa.array(np.add.reduceat(n, idx)),
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
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "salt"])
        .map_groups(local_sessions, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(merge, batch_format="pyarrow")
    )


def event_funnel(
    sf_dir: str,
    steps: "tuple[str, ...]" = ("view", "click", "purchase"),
    num_shards: int = 64,
):
    """Sequential funnel over the events stream: for each user, the
    first ``steps[0]`` event, then the first ``steps[1]`` STRICTLY
    after it, then the first ``steps[2]`` strictly after that, etc.
    One output row per (user, step reached): ``(step, event_type,
    user_id, ts_us)`` — the classic product-analytics conversion
    funnel (step counts are a trivial roll-up of this table).

    Shape: ONE shuffle. Events are pre-filtered to the step types at
    the read (predicate pushed into the scan task), coarse-sharded by
    ``splitmix64(user_id) % num_shards`` — NOT per-user groups, so the
    group count is bounded and each ``map_groups`` call is one Python
    invocation over a whole shard (the dedup/_emit_pairs_sharded
    lesson) — then each shard is lexsorted by (user, ts) once and the
    k funnel levels run as k vectorized passes over the sorted arrays
    (np.unique first-occurrence = per-user min since ts is the minor
    sort key; membership + previous-step timestamps via searchsorted
    against the previous level's sorted user array). Per-event work is
    O(k·log U_shard) with zero Python per row; shards stream
    independently, so at 100 TB this is one bounded exchange of the
    pre-filtered step events (raise ``num_shards`` with input size).

    Strictly-after semantics: an event at EXACTLY the previous step's
    timestamp does not advance the funnel (ties across levels are
    resolved by ``>``; within a level the per-user minimum ts needs no
    tie-break since equal minima are the same value).
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from .similarity import _splitmix64

    step_arr = pa.array(list(steps), pa.string())

    def tag(batch: pa.Table) -> pa.Table:
        code = pc.index_in(batch["event_type"], value_set=step_arr)
        keep = pc.is_valid(code)
        sub = batch.filter(keep)
        code = code.filter(keep)
        uid = sub["user_id"].to_numpy().astype(np.int64)
        return pa.Table.from_pydict(
            {
                "shard": (
                    _splitmix64(uid.astype(np.uint64)) % num_shards
                ).astype(np.int64),
                "user_id": uid,
                "ts": sub["ts"].cast(pa.int64()),
                "code": code.cast(pa.int8()),
            }
        )

    def funnel_shard(group: pa.Table) -> pa.Table:
        user = group["user_id"].to_numpy()
        ts = group["ts"].to_numpy()
        code = group["code"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, user))
        user, ts, code = user[order], ts[order], code[order]
        out_u: list[np.ndarray] = []
        out_t: list[np.ndarray] = []
        out_step: list[np.ndarray] = []
        prev_u = prev_t = None
        for i in range(len(steps)):
            m = code == i
            if prev_u is not None:
                if prev_u.size == 0:
                    break
                pos = np.searchsorted(prev_u, user)
                pos_c = np.minimum(pos, prev_u.size - 1)
                member = prev_u[pos_c] == user
                after = np.zeros(user.size, bool)
                after[member] = ts[member] > prev_t[pos_c[member]]
                m &= after
            u_i, t_i = user[m], ts[m]
            # filtered subset keeps (user asc, ts asc) order, so the
            # first occurrence per user IS that user's minimum ts
            uu, first = np.unique(u_i, return_index=True)
            tt = t_i[first]
            out_u.append(uu)
            out_t.append(tt)
            out_step.append(np.full(uu.size, i, np.int8))
            prev_u, prev_t = uu, tt
        if not out_u:
            su = np.empty(0, np.int64)
            st = np.empty(0, np.int64)
            sc = np.empty(0, np.int8)
        else:
            su = np.concatenate(out_u)
            st = np.concatenate(out_t)
            sc = np.concatenate(out_step)
        return pa.Table.from_pydict(
            {
                "step": (sc.astype(np.int64) + 1),
                "event_type": pa.array(
                    np.asarray(steps, object)[sc], pa.string()
                ),
                "user_id": su,
                "ts_us": st,
            }
        )

    return (
        _events(sf_dir, ["user_id", "ts", "event_type"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(funnel_shard, batch_format="pyarrow")
    )


def props_field_stats(sf_dir: str, field: str = "k"):
    """Semi-structured extraction over the events stream: pull the
    integer ``field`` out of the JSON ``props`` column with ONE RE2
    kernel (``pc.extract_regex`` — pyarrow and DuckDB share the RE2
    engine, so the extraction rule is bit-identical to the oracle's
    ``regexp_extract``), then per-event-type integer stats. Output:
    (event_type, n_events, sum_v, min_v, max_v) over rows where the
    field is present. All four stats are integer semilattice partials
    (each batch reduces to ≤ #event-types rows), so the single bounded
    ``groupby(event_type)`` is accumulation-order-exact at any scale —
    the fixed-point lesson from the window sums, applied by staying in
    int64 end to end. No per-row JSON parsing anywhere."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    pat = '"' + field + '":\\s*(?P<v>-?\\d+)'

    def partial(batch: pa.Table) -> pa.Table:
        props = pc.fill_null(batch["props"], "")
        ext = pc.extract_regex(props, pattern=pat)
        ok = pc.is_valid(ext).to_numpy(zero_copy_only=False)
        vals = np.zeros(len(props), np.int64)
        if ok.any():
            flat = pc.struct_field(ext, "v")
            vals[ok] = np.asarray(
                pc.cast(pc.drop_null(flat), pa.int64()).to_numpy()
            )
        et = pc.fill_null(batch["event_type"], "")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        det = et.dictionary_encode()
        codes = det.indices.to_numpy(zero_copy_only=False).astype(np.int64)[ok]
        v = vals[ok]
        if not v.size:
            return pa.Table.from_pydict(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                    "sum_v": pa.array([], pa.int64()),
                    "min_v": pa.array([], pa.int64()),
                    "max_v": pa.array([], pa.int64()),
                }
            )
        ucodes = np.unique(codes)
        remap = np.zeros(int(codes.max()) + 1, np.int64)
        remap[ucodes] = np.arange(ucodes.size)
        g = remap[codes]
        n = np.bincount(g, minlength=ucodes.size)
        # int64-exact grouped sums (np.bincount weights go through
        # float64): sort + reduceat stays integer end to end
        order = np.argsort(g, kind="stable")
        gs, vs = g[order], v[order]
        cuts = np.flatnonzero(np.diff(gs)) + 1
        s_exact = np.add.reduceat(vs, np.concatenate([[0], cuts]))
        mn = np.minimum.reduceat(vs, np.concatenate([[0], cuts]))
        mx = np.maximum.reduceat(vs, np.concatenate([[0], cuts]))
        return pa.Table.from_pydict(
            {
                "event_type": det.dictionary.take(pa.array(ucodes)),
                "n_events": n.astype(np.int64),
                "sum_v": s_exact.astype(np.int64),
                "min_v": mn.astype(np.int64),
                "max_v": mx.astype(np.int64),
            }
        )

    return (
        _events(sf_dir, ["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_v", alias_name="sum_v"),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v"),
        )
    )


def retention_cohorts(
    sf_dir: str, width_s: int = 7 * 86400, num_shards: int = 64
):
    """Cohort retention analysis: users grouped by the epoch-relative
    window (default week) of their FIRST event; for every (cohort,
    active window) pair, the number of that cohort's distinct users
    active in the window. Output: (cohort_week, active_week, n_users).

    One shuffle, and it is COARSE: each batch reduces to its distinct
    (user, week) pairs, the exchange shards by a hash of user_id (a
    user lives in exactly one shard, so distinct-user counts add up
    across shards without a second dedup), and inside a shard one
    lexsort + segment pass derives each user's cohort (min week) and
    emits ≤ windows² partial counts. Never a per-user group. Windows
    are integer microsecond floor divisions — exact at any scale."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .similarity import _splitmix64 as _sm64

    width_us = np.int64(width_s) * np.int64(1_000_000)

    def tag(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy().view("int64")
        users = batch["user_id"].to_numpy().astype(np.int64)
        wk = ts // width_us
        pairs = np.unique(np.stack([users, wk], axis=1), axis=0)
        with np.errstate(over="ignore"):
            shard = (
                _sm64(pairs[:, 0].astype(np.uint64)) % np.uint64(num_shards)
            ).astype(np.int64)
        return pa.Table.from_pydict(
            {"user_id": pairs[:, 0], "wk": pairs[:, 1], "shard": shard}
        )

    def reduce_shard(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy().astype(np.int64)
        w = group["wk"].to_numpy().astype(np.int64)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        first = np.ones(u.size, bool)
        if u.size:
            first[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        u, w = u[first], w[first]  # distinct across batches
        new_u = np.ones(u.size, bool)
        if u.size:
            new_u[1:] = u[1:] != u[:-1]
        seg = np.flatnonzero(new_u)[np.cumsum(new_u) - 1]
        cohort = w[seg]  # per-row: its user's min week (w sorted per user)
        key = np.stack([cohort, w], axis=1)
        uk, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.Table.from_pydict(
            {
                "cohort_week": uk[:, 0],
                "active_week": uk[:, 1],
                "n_users": cnt.astype(np.int64),
            }
        )

    return (
        _events(sf_dir, ["user_id", "ts"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(reduce_shard, batch_format="pyarrow")
        .groupby(["cohort_week", "active_week"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )
