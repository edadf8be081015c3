"""End-to-end conformance: Ray Data engine vs the Themis-semantics oracle
(SURVEY §5.2 items 3-4). Rank-identical top-k, scores bit-equal
(asserted ==; 1e-9 rel tolerance is the documented backstop)."""

import os

import numpy as np
import pyarrow.dataset as pads
import pytest

from themis_search_engine_ray.oracle import ThemisOracle
from themis_search_engine_ray.pipelines.index_build import BuildConfig, build_index
from themis_search_engine_ray.sources.transcripts import write_synthetic
from themis_search_engine_ray.stages.codec import decode_all_docs, skips_from_bytes
from themis_search_engine_ray.state.searcher import LocalSearchEngine, SearchEngine

N_TURNS = 600

QUERIES = [
    "meetings effective agent",
    "token model data response",
    "caresses ponies ties agreed",
    "relational conditional rational",
    "the and of",  # stopword-only -> empty
    "zzz unknownterm",  # unknown -> empty
    "agent",  # hot term, likely df > N/2 (negative idf)
    "hopefulness goodness revival allowance",
    "2020 90s 0xff",
    "state of the art end2end",
    "formalize electriciti electrical",
    "data data data agent",  # duplicate query terms dedupe
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("idx")
    corpus = str(tmp / "turns")
    write_synthetic(corpus, n_turns=N_TURNS, seed=42, turns_per_block=150)
    idx = str(tmp / "index")
    cfg = BuildConfig(num_partitions=2, term_parts=4, salt_bits=2)
    meta = build_index(corpus, idx, cfg)
    tab = pads.dataset(corpus, format="parquet").to_table()
    turns = list(
        zip(
            tab["conv_id"].to_pylist(),
            tab["turn_idx"].to_pylist(),
            tab["text"].to_pylist(),
        )
    )
    oracle = ThemisOracle(turns)
    return corpus, idx, meta, oracle


def test_global_stats_match(built):
    _, _, meta, oracle = built
    assert meta["n_docs"] == oracle.n_docs == N_TURNS
    assert meta["avgdl"] == oracle.avgdl


def test_topk_rank_identical_and_scores_bitexact(built):
    _, idx, _, oracle = built
    eng = SearchEngine(idx)
    try:
        for q in QUERIES:
            for k in (5, 20):
                got = eng.search(q, k=k)
                want = oracle.search(q, k=k)
                assert [(h.conv_id, h.turn_idx) for h in got] == [
                    (h.conv_id, h.turn_idx) for h in want
                ], q
                gs = np.array([h.score for h in got])
                ws = np.array([h.score for h in want])
                assert np.array_equal(gs, ws), (q, gs - ws)
    finally:
        eng.close()


def test_local_engine_matches_actor_engine(built):
    _, idx, _, oracle = built
    loc = LocalSearchEngine(idx)
    for q in QUERIES[:4]:
        got = loc.search(q, k=10)
        want = oracle.search(q, k=10)
        assert [(h.conv_id, h.turn_idx, h.score) for h in got] == [
            (h.conv_id, h.turn_idx, h.score) for h in want
        ]


def test_df_consistency(built):
    """Σ df over segment rows (term, salt, partition) == oracle df; and the
    global term_stats table agrees (salted reassembly invariant)."""
    _, idx, _, oracle = built
    ts = pads.dataset(os.path.join(idx, "term_stats"), format="parquet").to_table()
    df = dict(zip(ts["term"].to_pylist(), ts["df"].to_pylist()))
    assert len(df) == len(oracle.postings)
    for term, plist in oracle.postings.items():
        assert df[term] == len(plist), term


def test_postings_sorted_and_partition_disjoint(built):
    """Within every segment row: doc_ids strictly ascending; doc ranges
    respect the salt bucket boundaries."""
    _, idx, meta, _ = built
    part_root = os.path.join(idx, "partitions")
    salt_bits = meta["salt_bits"]
    seen_any = False
    for p in sorted(os.listdir(part_root)):
        seg_dir = os.path.join(part_root, p, "segments")
        for f in sorted(os.listdir(seg_dir)):
            tab = pads.dataset(os.path.join(seg_dir, f), format="parquet").to_table()
            for i in range(tab.num_rows):
                skips = skips_from_bytes(tab["skips"][i].as_buffer())
                ids = decode_all_docs(tab["docs"][i].as_buffer(), skips)
                assert np.all(np.diff(ids.astype(np.int64)) > 0)
                salts = ids >> np.uint64(63 - salt_bits)
                assert np.all(salts == np.uint64(tab["salt"][i].as_py()))
                seen_any = True
    assert seen_any


def test_doc_stats_match_oracle(built):
    _, idx, _, oracle = built
    part_root = os.path.join(idx, "partitions")
    got = {}
    for p in sorted(os.listdir(part_root)):
        ds_dir = os.path.join(part_root, p, "doc_stats")
        tab = pads.dataset(ds_dir, format="parquet").to_table(
            columns=["conv_id", "turn_idx", "dl"]
        )
        for c, t, d in zip(
            tab["conv_id"].to_pylist(), tab["turn_idx"].to_pylist(), tab["dl"].to_pylist()
        ):
            got[(c, t)] = d
    assert got == oracle.dl


def test_per_turn_text_equality_invariant(built, ray_session):
    """north_rule: per-turn text equality under stable (conv_id, turn_idx)
    ordering preserved end-to-end through a Ray pipeline."""
    import ray.data as rd

    corpus, _, _, _ = built
    out = (
        rd.read_parquet(corpus, columns=["conv_id", "turn_idx", "text"])
        .sort(["conv_id", "turn_idx"])
        .to_pandas()
    )
    src = (
        pads.dataset(corpus, format="parquet")
        .to_table(columns=["conv_id", "turn_idx", "text"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == src["text"].tolist()
    assert out["conv_id"].tolist() == src["conv_id"].tolist()
