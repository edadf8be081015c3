"""As-of join edge semantics on a hand-built events table (value
correctness vs DuckDB's own window-function oracle is driver-checked)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from themis_search_engine_ray.pipelines.joins import asof_join_events

US = 1_000_000


@pytest.fixture(scope="module")
def events_dir(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("asof")
    rows = [
        # user 1: click@10, error@10 (same ts -> matches), error@5 (no prior)
        (0, 10 * US, 1, "click", 1.5),
        (1, 10 * US, 1, "error", 0.0),
        (2, 5 * US, 1, "error", 0.0),
        # user 2: clicks@3,@7; error@8 takes the @7 click
        (3, 3 * US, 2, "click", 2.0),
        (4, 7 * US, 2, "click", 3.0),
        (5, 8 * US, 2, "error", 0.0),
        # user 3: error with no clicks at all
        (6, 4 * US, 3, "error", 0.0),
        # noise rows of other types are ignored
        (7, 1 * US, 2, "view", 9.0),
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


def test_asof_semantics(events_dir):
    out = asof_join_events(events_dir).to_pandas().set_index("event_id")
    assert set(out.index) == {1, 2, 5, 6}
    # same-timestamp click matches (ts <= error ts)
    assert out.loc[1, "click_event_id"] == 0 and out.loc[1, "click_value"] == 1.5
    # error before any click -> nulls
    assert pa.compute.is_null(pa.scalar(out.loc[2, "click_event_id"])).as_py() or (
        out.loc[2, "click_event_id"] != out.loc[2, "click_event_id"]
        or out.loc[2, "click_event_id"] is None
    )
    import pandas as pd

    assert pd.isna(out.loc[2, "click_event_id"])
    assert pd.isna(out.loc[6, "click_event_id"])
    # latest preceding click wins
    assert out.loc[5, "click_event_id"] == 4 and out.loc[5, "click_value"] == 3.0
    assert out.loc[5, "click_ts_s"] == 7


def test_range_join_semantics(events_dir):
    """Trailing-window interval join: boundary inclusion (ts equal to
    the error's), exclusion past the window start, zero-click errors."""
    from themis_search_engine_ray.pipelines.joins import range_join_events

    # window of 5 seconds: (err_ts - 5s, err_ts]
    out = (
        range_join_events(events_dir, window_s=5)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    # user 1 error@10: click@10 inside (5, 10]
    assert out.loc[1, "n_clicks"] == 1 and out.loc[1, "sum_click_value"] == 1.5
    # user 1 error@5: click@10 is in the future -> none
    assert out.loc[2, "n_clicks"] == 0 and out.loc[2, "sum_click_value"] == 0.0
    # user 2 error@8: window (3, 8] -> click@7 only (click@3 excluded,
    # open lower bound)
    assert out.loc[5, "n_clicks"] == 1 and out.loc[5, "sum_click_value"] == 3.0
    # user 3: no clicks at all
    assert out.loc[6, "n_clicks"] == 0 and out.loc[6, "sum_click_value"] == 0.0
    assert len(out) == 4  # one row per error, nothing else
