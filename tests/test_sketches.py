"""Misra-Gries heavy-hitters: summary properties, merge-by-sum error
bound vs exact counts, and the Ray pipelines over a synthetic table."""

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from themis_search_engine_ray.functions.analyzer import tokenize
from themis_search_engine_ray.pipelines.sketches import (
    misra_gries,
    topk_terms_exact,
    topk_terms_sketch,
)


def test_mg_summary_properties():
    counts = {f"t{i}": c for i, c in enumerate([100, 50, 50, 10, 5, 3, 2, 1])}
    n = sum(counts.values())
    m = 3
    mg = misra_gries(counts, m)
    assert len(mg) <= m
    bound = n / (m + 1)
    for t, est in mg.items():
        assert 0 < est <= counts[t]
        assert counts[t] - est <= bound
    # dropped terms must have true count within the bound
    for t, c in counts.items():
        if t not in mg:
            assert c <= bound
    # small dicts pass through exactly
    assert misra_gries({"a": 2, "b": 1}, 5) == {"a": 2, "b": 1}


@pytest.fixture(scope="module")
def zipf_docs(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sk")
    rng = np.random.default_rng(23)
    vocab = [f"w{i:03d}" for i in range(300)]
    weights = 1.0 / np.arange(1, len(vocab) + 1)  # Zipf
    weights /= weights.sum()
    rows = []
    for d in range(2000):
        toks = rng.choice(vocab, size=30, p=weights)
        rows.append({"doc_id": d, "text": " ".join(toks)})
    pq.write_table(pa.Table.from_pylist(rows), str(tmp / "documents.parquet"))
    true = collections.Counter()
    for r in rows:
        true.update(tokenize(r["text"]))
    return str(tmp), true


def test_exact_topk(zipf_docs):
    sf, true = zipf_docs
    out = topk_terms_exact(sf, k=20)
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(out["term"], out["count"])) == want


def test_sketch_refine_matches_exact(zipf_docs):
    """Default (refine=True) output: exact counts for the sketch-pruned
    candidates — equal to the true top-k whenever the MG bound holds
    (and, as the value-exact oracle gate relies on, on these corpora)."""
    sf, true = zipf_docs
    out = topk_terms_sketch(sf, k=20, capacity=256)
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(out["term"], out["count"])) == want


def test_sketch_error_bound_and_recall(zipf_docs):
    sf, true = zipf_docs
    m = 64
    out = topk_terms_sketch(sf, k=20, capacity=m, refine=False)
    n = sum(true.values())
    n_batches_bound = n / (m + 1)  # summed per-batch bounds telescope to N/(m+1)
    est = dict(zip(out["term"], out["est_count"]))
    for t, e in est.items():
        assert e <= true[t]
        assert true[t] - e <= n_batches_bound
    # every term whose count clears the k-th by more than the bound is found
    exact = topk_terms_exact(sf, k=20)
    kth = int(exact["count"].iloc[-1])
    guaranteed = {t for t, c in true.items() if c > kth + n_batches_bound}
    assert guaranteed <= set(est)


def test_sketch_warns_when_candidates_short_of_k(zipf_docs):
    """capacity << k: the candidate union can hold fewer than k terms —
    the truncated result must carry the not-certified UserWarning, not
    return silently (regression: the warning was gated on len == k)."""
    sf, _ = zipf_docs
    with pytest.warns(UserWarning, match="not certified"):
        out = topk_terms_sketch(sf, k=200, capacity=8)
    assert len(out) < 200


def test_sketch_candidate_cap_truncation(zipf_docs):
    """The distributed candidate cap (sort+limit before the driver
    collect): a cap comfortably above k still returns the true top-k
    on this head-heavy corpus (hot terms rank first in the summed
    sketch), and a cap at exactly k forces the uncertifiable case —
    kth <= boundary_est + bound — which must warn, not silently pass."""
    import warnings

    sf, true = zipf_docs
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # certified: no warning allowed
        out = topk_terms_sketch(sf, k=10, capacity=256, cand_cap=64)
    assert list(zip(out["term"], out["count"])) == want

    with pytest.warns(UserWarning, match="not certified"):
        tight = topk_terms_sketch(sf, k=10, capacity=256, cand_cap=10)
    # the returned counts are still exact for the candidates it kept
    for t, c in zip(tight["term"], tight["count"]):
        assert true[t] == c


def test_bit_length_u64_exact():
    from themis_search_engine_ray.pipelines.sketches import _bit_length_u64

    vals = [1, 2, 3, (1 << 32) - 1, 1 << 32, (1 << 52) - 1, 1 << 52,
            (1 << 53) - 1, (1 << 63) + 5, (1 << 64) - 1]
    got = _bit_length_u64(np.array(vals, np.uint64))
    assert got.tolist() == [int(v).bit_length() for v in vals]


def test_hll_rho_exact_near_power_of_two():
    """w = 2^52 - 1 (all 52 suffix bits set): float log2 rounds to 52
    and records rho 0 ('unseen'); the integer bit_length path must
    record the true rho = 1."""
    from themis_search_engine_ray.pipelines.sketches import _bit_length_u64

    p = 12
    w = np.array([(1 << (64 - p)) - 1], np.uint64)
    rho = (64 - p + 1 - _bit_length_u64(w)).astype(np.int8)
    assert rho[0] == 1
    # and the float path really is wrong here (documents the motivation)
    assert int(64 - p - np.floor(np.log2(w.astype(np.float64))[0])) == 0


def test_hll_bound_and_mergeability(zipf_docs):
    """HLL estimate within 3 sigma (sigma = 1.04/sqrt(m)) of the true
    distinct count; register merge across disjoint halves equals the
    union's registers (max-mergeable, the property the groupby relies
    on); linear-counting regime exact-ish for tiny cardinalities."""
    import numpy as np

    from themis_search_engine_ray.pipelines.sketches import (
        _hll_registers,
        distinct_terms_hll,
        hll_estimate,
    )

    sf, true = zipf_docs
    n_true = len(true)
    out = distinct_terms_hll(sf)
    est = int(out["n_distinct_est"].iloc[0])
    sigma = 1.04 / (1 << 12) ** 0.5
    assert abs(est - n_true) <= 3 * sigma * n_true + 2

    # mergeability: max of per-half registers == registers of the union
    toks = [f"tok{i}" for i in range(5000)]
    r_all = _hll_registers(toks)
    r_merged = np.maximum(_hll_registers(toks[:2500]), _hll_registers(toks[2500:]))
    assert (r_all == r_merged).all()
    e = hll_estimate(r_all)
    assert abs(e - 5000) <= 3 * sigma * 5000

    # small-range (linear counting) regime
    assert abs(hll_estimate(_hll_registers([f"x{i}" for i in range(50)])) - 50) <= 3


def test_bit_length_u64_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from themis_search_engine_ray.pipelines.sketches import _bit_length_u64

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.integers(0, (1 << 64) - 1), min_size=1, max_size=50))
    def check(xs):
        got = _bit_length_u64(np.array(xs, np.uint64))
        assert got.tolist() == [int(v).bit_length() for v in xs]

    check()
