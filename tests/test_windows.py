"""Windowed-aggregate edge semantics on a hand-built events table
(driver value-correctness vs DuckDB is covered by oracle_sql)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from themis_search_engine_ray.pipelines.windows import (
    sessionize,
    sliding_counts,
    tumbling_counts,
)

US = 1_000_000


@pytest.fixture(scope="module")
def events_dir(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("win")
    rows = [
        # user 1: two events 1800s apart exactly (== gap -> SAME session),
        # then one 1801s later (> gap -> new session)
        (0, 1_000 * US, 1, "view", 1.0),
        (1, 2_800 * US, 1, "view", 2.0),
        (2, 4_601 * US, 1, "click", 4.0),
        # user 2: single event; window boundary at exactly 3600s
        (3, 3_600 * US, 2, "view", 8.0),
        (4, 3_599 * US, 2, "view", 16.0),
    ]
    tab = pa.Table.from_pydict(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tab, str(tmp / "events.parquet"))
    return str(tmp)


def test_tumbling_boundary(events_dir):
    out = tumbling_counts(events_dir, width_s=3600).to_pandas()
    by_win = out.groupby("window_start")["n_events"].sum().to_dict()
    # ts=3600s falls in the SECOND window [3600, 7200)
    assert by_win == {0: 3, 3600: 2}


def test_sliding_coverage(events_dir):
    out = sliding_counts(events_dir, width_s=3600, slide_s=900).to_pandas()
    cov = dict(zip(out["window_start"], out["n_events"]))
    # event at 1000s is covered by windows starting 0 and 900 (not -900
    # or earlier: clipped at epoch; 1800/2700 start after it)
    assert cov[0] >= 1 and cov[900] >= 1
    assert all(ws >= 0 for ws in cov)
    # each event appears in at most width/slide = 4 windows
    assert out["n_events"].sum() <= 5 * 4


def test_sessionize_gap_semantics(events_dir):
    out = sessionize(events_dir, gap_s=1800).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("session_idx")
    # exactly-at-gap stays together; strictly-greater splits
    assert len(u1) == 2
    assert u1.iloc[0]["n_events"] == 2 and u1.iloc[0]["session_start"] == 1000
    assert u1.iloc[0]["session_end"] == 2800
    assert u1.iloc[1]["n_events"] == 1 and u1.iloc[1]["session_start"] == 4601
    u2 = out[out["user_id"] == 2]
    assert len(u2) == 1 and int(u2.iloc[0]["n_events"]) == 2
    np.testing.assert_allclose(u2.iloc[0]["sum_value"], 24.0)


def test_fixed_point_rejects_nulls_and_non_fixed(ray_session, tmp_path):
    # the fixed-point contract fails LOUDLY (no silent float fallback)
    tab = pa.Table.from_pydict(
        {
            "event_id": pa.array([0, 1], pa.int64()),
            "ts": pa.array([0, US], pa.timestamp("us")),
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": pa.array(["view", "view"]),
            "value": pa.array([1.0, None], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    with pytest.raises(Exception, match="NULL"):
        tumbling_counts(str(tmp_path), width_s=3600).to_pandas()
    # decimals=None: null-skipping float semantics work
    out = tumbling_counts(str(tmp_path), width_s=3600, decimals=None).to_pandas()
    assert out["n_events"].sum() == 2

    tab = tab.set_column(
        tab.schema.get_field_index("value"),
        "value",
        pa.array([1.0, 0.123], pa.float64()),  # 3 decimals > the default 2
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    with pytest.raises(Exception, match="fixed-point"):
        tumbling_counts(str(tmp_path), width_s=3600).to_pandas()


def test_sessionize_salted_hot_user_crossing_days(ray_session, tmp_path):
    """A hot user whose continuous activity spans many day buckets must
    come out of the SALTED sessionizer identical to the single-bucket
    computation and a brute-force reference — sessions that cross salt
    boundaries merge back exactly (count, endpoints, exact cent sums)."""
    from themis_search_engine_ray.pipelines.windows import sessionize as sz

    rng = np.random.RandomState(7)
    rows = []
    # hot user 1: one event every 600s for 12 days -> ONE session
    # crossing 11 midnight boundaries
    t = 500 * US
    for i in range(12 * 144):
        rows.append((1, t, round(float(rng.randint(0, 10_000)) / 100, 2)))
        t += 600 * US
    # user 2: four sessions, one straddling a midnight boundary
    # (23:59:40 -> 00:00:30 next day, gap 50s); the 1900s gap on day 3
    # splits
    day = 86_400 * US
    for ts in (day - 20 * US, day + 30 * US, 3 * day + 100 * US,
               3 * day + 2000 * US, 5 * day):
        rows.append((2, ts, 1.25))
    tab = pa.Table.from_pydict(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    sf = str(tmp_path)

    def canon(df):
        return (
            df.sort_values(["user_id", "session_idx"])
            .reset_index(drop=True)[
                ["user_id", "session_idx", "session_start",
                 "session_end", "n_events", "sum_value"]
            ]
        )

    salted = canon(sz(sf, gap_s=1800, salt_s=86400).to_pandas())
    single = canon(sz(sf, gap_s=1800, salt_s=10**9).to_pandas())
    assert salted.equals(single)  # bit-identical incl. float sums

    # brute-force reference
    want = []
    for uid in (1, 2):
        ev = sorted((r[1], r[2]) for r in rows if r[0] == uid)
        cur = [ev[0]]
        sessions = []
        for e in ev[1:]:
            if e[0] - cur[-1][0] > 1800 * US:
                sessions.append(cur)
                cur = [e]
            else:
                cur.append(e)
        sessions.append(cur)
        for si, s in enumerate(sessions):
            cents = sum(int(round(v * 100)) for _, v in s)
            want.append((uid, si, s[0][0] // US, s[-1][0] // US,
                         len(s), cents / 100.0))
    assert list(map(tuple, salted.itertuples(index=False))) == want
    # the hot user really is ONE session spanning 12 day-buckets
    assert (salted["user_id"] == 1).sum() == 1
    assert (salted["user_id"] == 2).sum() == 4


def test_event_funnel_strictly_after(ray_session, tmp_path):
    from themis_search_engine_ray.pipelines.windows import event_funnel

    rows = [
        # user 1 completes the funnel (view@10 -> click@20 -> purchase@30);
        # the earlier click@5 and purchase@15 must NOT count
        (0, 5, 1, "click"),
        (1, 10, 1, "view"),
        (2, 15, 1, "purchase"),
        (3, 20, 1, "click"),
        (4, 30, 1, "purchase"),
        # user 2: click at EXACTLY the first-view timestamp -> strictly-
        # after excludes it; the later click advances, no purchase
        (5, 100, 2, "view"),
        (6, 100, 2, "click"),
        (7, 200, 2, "click"),
        # user 3: never views -> reaches no step (click/purchase ignored)
        (8, 50, 3, "click"),
        (9, 60, 3, "purchase"),
        # user 4: unrelated event types only
        (10, 70, 4, "error"),
    ]
    tab = pa.Table.from_pydict(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * US for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    out = event_funnel(str(tmp_path)).to_pandas()
    got = {
        (int(r.user_id), int(r.step)): (r.event_type, int(r.ts_us) // US)
        for r in out.itertuples()
    }
    assert got == {
        (1, 1): ("view", 10),
        (1, 2): ("click", 20),
        (1, 3): ("purchase", 30),
        (2, 1): ("view", 100),
        (2, 2): ("click", 200),
    }


def test_event_funnel_shard_invariance(ray_session, tmp_path):
    """The funnel result is independent of the coarse shard count."""
    from themis_search_engine_ray.pipelines.windows import event_funnel

    rng = np.random.RandomState(7)
    n = 400
    tab = pa.Table.from_pydict(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(
                rng.randint(0, 10_000, n).astype(np.int64) * US,
                pa.timestamp("us"),
            ),
            "user_id": pa.array(rng.randint(0, 37, n), pa.int64()),
            "event_type": pa.array(
                rng.choice(["view", "click", "purchase", "error"], n)
            ),
            "value": pa.array(np.zeros(n), pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    key = ["step", "user_id"]
    a = (
        event_funnel(str(tmp_path), num_shards=1)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    b = (
        event_funnel(str(tmp_path), num_shards=64)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(a) > 0
