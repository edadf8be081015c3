"""Data mixing: waterfill planning math, threshold edges, and the
deterministic splitmix64 sampler vs an exact numpy recompute."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from themis_search_engine_ray.pipelines.mixing import (
    mix_plan,
    mix_sample,
    sample_threshold,
    waterfill_rates,
)
from themis_search_engine_ray.pipelines.similarity import _splitmix64

SF = "/root/testdata/sf0.001"


def test_waterfill_budget_conservation():
    avail = {"a": 1000, "b": 500, "c": 2000}
    rates = waterfill_rates(avail, 1400, {"a": 1.0, "b": 1.0, "c": 1.0})
    got = sum(rates[s] * avail[s] for s in avail)
    assert got == pytest.approx(1400, rel=1e-9)
    assert all(0.0 <= r <= 1.0 for r in rates.values())


def test_waterfill_saturation_redistributes():
    # b can only hold 100 of its 700 share; the surplus flows to a and c
    avail = {"a": 10_000, "b": 100, "c": 10_000}
    rates = waterfill_rates(avail, 2100, {"a": 1.0, "b": 1.0, "c": 1.0})
    assert rates["b"] == pytest.approx(1.0)  # saturated
    assert rates["a"] * avail["a"] == pytest.approx(1000, rel=1e-9)
    assert rates["c"] * avail["c"] == pytest.approx(1000, rel=1e-9)


def test_waterfill_overbudget_and_zero_weight():
    avail = {"a": 10, "b": 20, "c": 30}
    rates = waterfill_rates(avail, 10_000, {"a": 1.0, "b": 1.0, "c": 0.0})
    assert rates["a"] == rates["b"] == 1.0  # budget exceeds supply
    assert rates["c"] == 0.0  # zero weight gets nothing


def test_sample_threshold_edges():
    assert sample_threshold(0.0) == -1
    assert sample_threshold(-1.0) == -1
    assert sample_threshold(1.0) == (1 << 64) - 1
    assert sample_threshold(2.0) == (1 << 64) - 1
    half = sample_threshold(0.5)
    assert 0 < half < (1 << 64) - 1
    # a tiny POSITIVE rate clamps to 0 (keep h==0 only) — never the -1
    # keep-nothing sentinel, which a uint64 cast would wrap into
    # keep-EVERYTHING
    assert sample_threshold(1e-30) == 0
    assert sample_threshold(2.0**-64) == 0


def test_mix_sample_tiny_rate_and_null_source(ray_session, tmp_path):
    # tiny positive rate keeps (almost) nothing instead of wrapping to
    # keep-all; NULL sources sample under the "" key (the same
    # normalization source_token_counts plans under)
    tab = pa.Table.from_pydict(
        {
            "doc_id": pa.array(list(range(64)), pa.int64()),
            "source": pa.array(
                [None if i % 2 else "srcA" for i in range(64)], pa.string()
            ),
            "text": pa.array(["alpha beta"] * 64),
        }
    )
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = mix_sample(str(tmp_path), {"srcA": 1e-30, "": 1.0}).to_pandas()
    # every NULL-source doc kept under the "" rate-1 budget
    assert got["source"].isna().sum() == 32
    # the tiny-rate source keeps only docs whose splitmix64 hash is 0
    kept_a = got[got["source"] == "srcA"]["doc_id"].to_numpy()
    h = _splitmix64(np.arange(64, dtype=np.uint64))
    assert set(kept_a) == set(np.flatnonzero(h[::2] == 0) * 2)


def test_mix_sample_matches_numpy_exactly(ray_session):
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0, "src3": 0.25}
    got = mix_sample(SF, rates).to_pandas()
    kept = set(got["doc_id"].astype(int))

    tab = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    ids = tab["doc_id"].to_numpy().astype(np.uint64)
    srcs = tab["source"].to_pylist()
    h = _splitmix64(ids)
    want = set()
    for i, s, hv in zip(ids, srcs, h):
        t = sample_threshold(rates.get(s, 0.0))
        if t >= 0 and int(hv) <= t:
            want.add(int(i))
    assert kept == want
    assert not any(s == "src2" for s in got["source"])  # rate 0 drops all
    src0_total = sum(1 for s in srcs if s == "src0")
    assert (got["source"] == "src0").sum() == src0_total  # rate 1 keeps all
    # deterministic across runs
    again = set(mix_sample(SF, rates).to_pandas()["doc_id"].astype(int))
    assert again == kept


def test_mix_plan_end_to_end(ray_session):
    plan = mix_plan(SF, budget_tokens=0)  # zero budget: all rates 0
    assert (plan["rate"] == 0.0).all()

    counts = plan.set_index("source")["n_tokens"].astype(int)
    total = int(counts.sum())
    plan2 = mix_plan(SF, budget_tokens=total / 2)
    planned = (plan2["rate"] * plan2["n_tokens"]).sum()
    assert planned == pytest.approx(total / 2, rel=1e-6)
    # and a huge budget keeps everything
    plan3 = mix_plan(SF, budget_tokens=10 * total)
    assert (plan3["rate"] == 1.0).all()
