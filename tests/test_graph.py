"""Distributed PageRank (pipelines/graph.py) vs a numpy power-iteration
reference — including dangling-node redistribution on directed graphs."""

import numpy as np
import pytest


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _numpy_pagerank(edges, n_iter=20, d=0.85):
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nr = np.zeros(n)
        for s, t in edges:
            nr[idx[t]] += r[idx[s]] / out[idx[s]]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (nr + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def _run(edges_list, n_iter=20, symmetric=False):
    import pyarrow as pa
    import ray.data as rd

    from themis_search_engine_ray.pipelines.graph import pagerank

    ds = rd.from_arrow(
        pa.Table.from_pydict(
            {
                "src": pa.array([e[0] for e in edges_list], pa.int64()),
                "dst": pa.array([e[1] for e in edges_list], pa.int64()),
            }
        )
    )
    got = pagerank(ds, n_iter=n_iter, symmetric=symmetric).to_pandas()
    return dict(zip(got["node"].astype(int), got["rank"]))


def test_pagerank_directed_with_dangling():
    # 4 -> dangling sink; classic asymmetric graph
    edges = [(1, 2), (2, 3), (3, 1), (1, 4), (2, 4)]
    got = _run(edges)
    want = _numpy_pagerank(edges)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-6)


def test_pagerank_symmetric_fast_path_matches_general():
    und = [(1, 2), (2, 3), (3, 4), (1, 3)]
    edges = und + [(b, a) for a, b in und]
    got_fast = _run(edges, symmetric=True)
    got_gen = _run(edges, symmetric=False)
    want = _numpy_pagerank(edges)
    for k in want:
        assert got_fast[k] == pytest.approx(want[k], rel=1e-9)
        assert got_gen[k] == pytest.approx(want[k], rel=1e-9)


def test_pagerank_dup_graph_entry():
    from themis_search_engine_ray.pipelines.dedup import ngram_jaccard_pairs
    from themis_search_engine_ray.pipelines.graph import pagerank_dup_graph

    SF = "/root/testdata/sf0.001"
    got = pagerank_dup_graph(SF, n_iter=6).to_pandas()
    pairs = ngram_jaccard_pairs(SF).to_pandas()
    edges = [(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])]
    edges = edges + [(b, a) for a, b in edges]
    want = _numpy_pagerank(edges, n_iter=6)
    got_map = dict(zip(got["doc_id"].astype(int), got["rank"]))
    assert got_map.keys() == want.keys()
    for k in want:
        assert got_map[k] == pytest.approx(round(want[k], 6), abs=2e-6)
