"""Deterministic sampling + group quantiles (pipelines/sampling.py)."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_stratified_sample_is_deterministic_and_correct_rule():
    import hashlib

    from themis_search_engine_ray.pipelines.sampling import stratified_sample

    a = stratified_sample(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = stratified_sample(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)  # pure function of the row
    for i in a["doc_id"]:
        assert hashlib.md5(str(i).encode()).hexdigest()[:4] <= "1999"
    # rate sanity: ~10% of 500
    assert 20 <= len(a) <= 90


def test_group_quantiles_match_numpy_reference():
    import pyarrow.parquet as pq

    from themis_search_engine_ray.pipelines.sampling import (
        _quantile_cont,
        group_quantiles,
    )

    got = group_quantiles(SF).to_pandas().set_index("event_type")
    tab = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"])
    df = tab.to_pandas()
    for et, grp in df.groupby("event_type"):
        vals = np.sort(grp["value"].to_numpy())
        assert got.loc[et, "n"] == len(vals)
        # median within rounding of the independent numpy computation
        assert abs(got.loc[et, "q50"] - float(np.quantile(vals, 0.5))) < 1e-5
        # exact interpolation formula
        assert got.loc[et, "q90"] == pytest.approx(
            round(_quantile_cont(vals, 0.9), 6), abs=1e-9
        )


def test_quantile_cont_singleton_and_edges():
    from themis_search_engine_ray.pipelines.sampling import _quantile_cont

    assert _quantile_cont(np.array([7.0]), 0.9) == 7.0
    v = np.array([1.0, 2.0, 3.0, 4.0])
    assert _quantile_cont(v, 0.0) == 1.0
    assert _quantile_cont(v, 1.0) == 4.0
    assert _quantile_cont(v, 0.5) == 2.5


def test_gather_ranges_equivalence():
    from themis_search_engine_ray.stages.codec import (
        gather_ranges,
        ranges_to_indices,
    )

    rng = np.random.RandomState(3)
    data = rng.randint(0, 1 << 40, size=10000).astype(np.uint64)
    starts = rng.randint(0, 9000, size=300)
    lens = rng.randint(0, 50, size=300)
    np.testing.assert_array_equal(
        gather_ranges(data, starts, lens),
        data[ranges_to_indices(starts, lens)],
    )
    assert gather_ranges(data, np.array([]), np.array([])).size == 0


def test_latest_n_per_user_matches_pandas():
    import pyarrow.parquet as pq

    from themis_search_engine_ray.pipelines.sampling import latest_n_per_user

    n = 3
    got = (
        latest_n_per_user(SF, n=n)
        .to_pandas()
        .sort_values(["user_id", "rn"])
        .reset_index(drop=True)
    )
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_id", "ts"]
    ).to_pandas()
    ev["tus"] = ev["ts"].astype("int64")
    ev = ev.sort_values(
        ["user_id", "tus", "event_id"], ascending=[True, False, False]
    )
    ev["rn"] = ev.groupby("user_id").cumcount()
    want = ev[ev["rn"] < n].copy()
    want["ts_s"] = want["tus"] // 1_000_000
    want = want[["user_id", "event_id", "ts_s", "rn"]].reset_index(drop=True)
    assert got["rn"].max() < n
    assert (
        got[["user_id", "event_id", "ts_s", "rn"]]
        .astype("int64")
        .equals(want.astype("int64"))
    )


def test_group_quantiles_hist_bound(ray_session):
    """Histogram-sketch quantiles within ONE bin-width of the exact
    quantile_cont values, per group and quantile."""
    from themis_search_engine_ray.pipelines.sampling import (
        QUANTILES,
        group_quantiles,
        group_quantiles_hist,
    )

    sf = "/root/testdata/sf0.01"
    exact = group_quantiles(sf).to_pandas().set_index("event_type").sort_index()
    est = group_quantiles_hist(sf, bins=2048).set_index("event_type").sort_index()
    assert list(exact.index) == list(est.index)
    import duckdb

    rng = duckdb.sql(
        f"SELECT event_type, max(value) - min(value) AS r "
        f"FROM '{sf}/events.parquet' GROUP BY 1"
    ).df().set_index("event_type")["r"]
    for g in exact.index:
        width = rng[g] / 2048
        assert est.loc[g, "n"] == exact.loc[g, "n"]
        for q in QUANTILES:
            col = f"q{int(q * 100)}"
            assert abs(est.loc[g, col] - exact.loc[g, col]) <= width + 1e-9, (
                g, col, est.loc[g, col], exact.loc[g, col], width)


def test_group_quantiles_hist_bound_gapped(ray_session, tmp_path):
    """Adversarial empty-bin-gap distribution: a fractional quantile
    rank straddling two values on opposite sides of a huge run of
    empty bins. A landing-bin-only interpolator errs by ~(max-min)/2
    here; the two-order-statistic estimator stays within one bin."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from themis_search_engine_ray.pipelines.sampling import (
        QUANTILES,
        group_quantiles,
        group_quantiles_hist,
    )

    bins = 2048
    # 5 values at 0.0, 5 at 1.0: q50 rank rn = 4.5 straddles the gap
    vals = [0.0] * 5 + [1.0] * 5
    tab = pa.table(
        {
            "event_type": ["gap"] * len(vals),
            "value": pa.array(vals, pa.float64()),
            "user_id": list(range(len(vals))),
            "ts": list(range(len(vals))),
        }
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    exact = group_quantiles(str(tmp_path)).to_pandas().set_index("event_type")
    est = group_quantiles_hist(str(tmp_path), bins=bins).set_index("event_type")
    width = 1.0 / bins
    assert exact.loc["gap", "q50"] == 0.5
    for q in QUANTILES:
        col = f"q{int(q * 100)}"
        assert abs(est.loc["gap", col] - exact.loc["gap", col]) <= width + 1e-9, (
            col, est.loc["gap", col], exact.loc["gap", col])


def test_group_quantiles_hist_bound_property(ray_session, tmp_path):
    """Randomized gapped/clustered distributions: the one-bin-width
    bound holds for every group and quantile."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from themis_search_engine_ray.pipelines.sampling import (
        QUANTILES,
        group_quantiles,
        group_quantiles_hist,
    )

    bins = 256
    counter = [0]

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, width=32),
            min_size=2,
            max_size=60,
        )
    )
    def check(vals):
        counter[0] += 1
        d = tmp_path / f"case{counter[0]}"
        d.mkdir()
        tab = pa.table(
            {
                "event_type": ["g"] * len(vals),
                "value": pa.array([float(v) for v in vals], pa.float64()),
                "user_id": list(range(len(vals))),
                "ts": list(range(len(vals))),
            }
        )
        pq.write_table(tab, str(d / "events.parquet"))
        exact = group_quantiles(str(d)).to_pandas().set_index("event_type")
        est = group_quantiles_hist(str(d), bins=bins).set_index("event_type")
        width = (max(vals) - min(vals)) / bins
        for q in QUANTILES:
            col = f"q{int(q * 100)}"
            assert abs(est.loc["g", col] - exact.loc["g", col]) <= width + 1e-6, (
                vals, col, est.loc["g", col], exact.loc["g", col])

    check()


def test_dataset_split_partition_and_determinism():
    from themis_search_engine_ray.pipelines.sampling import dataset_split

    a = dataset_split(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = dataset_split(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)  # pure function of (doc_id, seed)
    # every document lands in exactly one split
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert len(a) == n_docs
    assert a["doc_id"].is_unique
    assert set(a["split"]) <= {"train", "val", "test"}
    # 90/5/5 within loose binomial slack on 500 docs
    frac = (a["split"] == "train").mean()
    assert 0.82 <= frac <= 0.97


def test_dataset_split_seed_gives_independent_assignment():
    from themis_search_engine_ray.pipelines.sampling import dataset_split

    a = dataset_split(SF, seed=0).to_pandas().set_index("doc_id")["split"]
    b = dataset_split(SF, seed=1).to_pandas().set_index("doc_id")["split"]
    assert (a != b.loc[a.index]).any()  # different streams


def test_dataset_split_matches_scalar_rule():
    from themis_search_engine_ray.pipelines.sampling import (
        _GOLDEN,
        dataset_split,
        split_boundaries,
    )
    from themis_search_engine_ray.pipelines.similarity import _splitmix64

    fr = {"train": 0.5, "val": 0.5}
    bounds = split_boundaries(fr)
    got = dataset_split(SF, fractions=fr, seed=3).to_pandas()
    with np.errstate(over="ignore"):
        h = _splitmix64(
            got["doc_id"].to_numpy().astype(np.uint64)
            + np.uint64((3 * _GOLDEN) % (1 << 64))
        )
    for hv, sp in zip(h, got["split"]):
        want = next(name for name, b in bounds if int(hv) <= b)
        assert sp == want


def test_split_boundaries_validation():
    from themis_search_engine_ray.pipelines.sampling import split_boundaries

    with pytest.raises(ValueError):
        split_boundaries({})
    with pytest.raises(ValueError):
        split_boundaries({"a": 0.0, "b": 1.0})
    with pytest.raises(ValueError):
        split_boundaries({"a": 0.7, "b": 0.5})
    bounds = split_boundaries({"a": 1.0})
    assert bounds == [("a", (1 << 64) - 1)]


def test_split_boundaries_properties():
    """Property test: for any valid fractions dict the boundaries are
    strictly increasing, end at 2^64-1, and each split's hash-line
    share is within one ulp-scaled slot of its fraction."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from themis_search_engine_ray.pipelines.sampling import split_boundaries

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=1e-6, max_value=1.0),
            min_size=1,
            max_size=8,
        )
    )
    def check(weights):
        total = sum(weights)
        fractions = {f"s{i}": w / total for i, w in enumerate(weights)}
        if sum(fractions.values()) > 1.0 + 1e-9:
            return
        bounds = split_boundaries(fractions)
        uppers = [b for _, b in bounds]
        assert uppers == sorted(uppers)
        assert len(set(uppers)) == len(uppers)  # strictly increasing
        assert uppers[-1] == (1 << 64) - 1
        prev = -1
        for (name, b), frac in zip(bounds, fractions.values()):
            share = (b - prev) / 2.0**64
            # the final boundary absorbs the float residue of the
            # cumulative sum (a few ulps of 1.0 ~ 1e-15): a flat 1e-9
            # bound covers it with orders of magnitude to spare
            assert abs(share - frac) < 1e-9
            prev = b

    check()
