"""doc_id_mode="dense": salt stays hash-derived (top bits) but ranks
are dense per salt — rank-identical results vs the oracle, stable
across rebuilds, and doc blobs several times smaller than hash mode."""

import os

import numpy as np
import pyarrow.dataset as pads
import pytest

from themis_search_engine_ray.oracle import ThemisOracle
from themis_search_engine_ray.pipelines.index_build import (
    BuildConfig,
    build_index,
)
from themis_search_engine_ray.sources.transcripts import write_synthetic
from themis_search_engine_ray.state.searcher import LocalSearchEngine

QUERIES = ["meetings effective agent", "token model data response", "agent"]


def _doc_blob_bytes(idx: str) -> int:
    total = 0
    part_root = os.path.join(idx, "partitions")
    for p in sorted(os.listdir(part_root)):
        seg_dir = os.path.join(part_root, p, "segments")
        for f in os.listdir(seg_dir):
            tab = pads.dataset(os.path.join(seg_dir, f), format="parquet").to_table(
                columns=["docs"]
            )
            total += sum(len(b) for b in tab["docs"].to_pylist())
    return total


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dense")
    corpus = str(tmp / "turns")
    write_synthetic(corpus, n_turns=600, seed=71, turns_per_block=120)
    dense_idx = str(tmp / "dense")
    hash_idx = str(tmp / "hash")
    build_index(
        corpus,
        dense_idx,
        BuildConfig(num_partitions=2, term_parts=2, salt_bits=2, doc_id_mode="dense"),
    )
    build_index(
        corpus, hash_idx, BuildConfig(num_partitions=2, term_parts=2, salt_bits=2)
    )
    tab = pads.dataset(corpus, format="parquet").to_table()
    oracle = ThemisOracle(
        list(
            zip(
                tab["conv_id"].to_pylist(),
                tab["turn_idx"].to_pylist(),
                tab["text"].to_pylist(),
            )
        )
    )
    return corpus, dense_idx, hash_idx, oracle


def test_dense_rank_identical_to_oracle(built):
    _, dense_idx, _, oracle = built
    eng = LocalSearchEngine(dense_idx)
    for q in QUERIES:
        got = eng.search(q, k=15)
        want = oracle.search(q, k=15)
        assert [(h.conv_id, h.turn_idx) for h in got] == [
            (h.conv_id, h.turn_idx) for h in want
        ], q
        np.testing.assert_array_equal(
            np.array([h.score for h in got]), np.array([h.score for h in want])
        )


def test_dense_ids_are_dense_and_salted(built):
    _, dense_idx, _, _ = built
    eng = LocalSearchEngine(dense_idx)
    ids = eng.shard.doc_ids
    salt_bits = eng.meta["salt_bits"]
    shift = np.uint64(63 - salt_bits)
    salts = (ids >> shift).astype(np.int64)
    for s in np.unique(salts):
        ranks = (ids[salts == s] & np.uint64((1 << (63 - salt_bits)) - 1)).astype(
            np.int64
        )
        ranks.sort()
        # dense: exactly 0..n-1 within each salt
        assert np.array_equal(ranks, np.arange(ranks.size))


def test_dense_compresses_doc_blobs(built):
    _, dense_idx, hash_idx, _ = built
    dense_bytes = _doc_blob_bytes(dense_idx)
    hash_bytes = _doc_blob_bytes(hash_idx)
    assert dense_bytes * 3 < hash_bytes  # ≥3x smaller doc blobs


def test_dense_survives_compaction(built):
    from themis_search_engine_ray.pipelines.index_build import compact_index

    _, dense_idx, _, oracle = built
    before = [
        (h.conv_id, h.turn_idx, h.score)
        for h in LocalSearchEngine(dense_idx).search(QUERIES[0], k=15)
    ]
    compact_index(dense_idx)
    after = [
        (h.conv_id, h.turn_idx, h.score)
        for h in LocalSearchEngine(dense_idx).search(QUERIES[0], k=15)
    ]
    assert before == after


def test_dense_rebuild_is_stable(built, tmp_path):
    corpus, dense_idx, _, _ = built
    idx2 = str(tmp_path / "dense2")
    build_index(
        corpus,
        idx2,
        BuildConfig(num_partitions=2, term_parts=2, salt_bits=2, doc_id_mode="dense"),
    )
    a = LocalSearchEngine(dense_idx).shard.doc_ids
    b = LocalSearchEngine(idx2).shard.doc_ids
    assert np.array_equal(a, b)
