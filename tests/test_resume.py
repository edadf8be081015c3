"""Checkpoint/resume tests (SURVEY §5.2 item 5, north_rule resumability)."""

import json
import os
import shutil

import pyarrow.dataset as pads

from themis_search_engine_ray.pipelines.index_build import (
    BuildConfig,
    _list_input_files,
    _partition_files,
    build_index,
    build_partition,
    finalize_index,
)
from themis_search_engine_ray.sources.transcripts import write_synthetic


def _index_digest(idx: str) -> dict:
    """Content digest of segments + doc stats, order-insensitive."""
    import hashlib

    out = {}
    part_root = os.path.join(idx, "partitions")
    for p in sorted(os.listdir(part_root)):
        seg_dir = os.path.join(part_root, p, "segments")
        for f in sorted(os.listdir(seg_dir)):
            tab = pads.dataset(os.path.join(seg_dir, f), format="parquet").to_table()
            h = hashlib.blake2b(digest_size=16)
            for col in ("term", "df", "docs", "tfs", "skips"):
                for v in tab[col].to_pylist():
                    h.update(repr(v).encode() if not isinstance(v, bytes) else v)
            out[f"{p}/{f}"] = h.hexdigest()
    return out


def test_resume_after_partial_build(ray_session, tmp_path):
    corpus = str(tmp_path / "turns")
    write_synthetic(corpus, n_turns=400, seed=7, turns_per_block=100)
    cfg = BuildConfig(num_partitions=3, term_parts=2, salt_bits=1)

    # full reference build
    full_idx = str(tmp_path / "full")
    meta_full = build_index(corpus, full_idx, cfg)

    # "killed" build: only partition 0 completed, then resume
    part_idx = str(tmp_path / "partial")
    files = _list_input_files(corpus)
    parts = _partition_files(files, cfg.num_partitions)
    os.makedirs(os.path.join(part_idx, "manifest"), exist_ok=True)
    man = build_partition(0, parts[0], part_idx, cfg)
    with open(os.path.join(part_idx, "manifest", "p00000.json"), "w") as f:
        json.dump(man, f)

    meta_resumed = build_index(corpus, part_idx, cfg)
    assert meta_resumed["partitions_skipped"] == 1
    assert meta_resumed["partitions_built"] == 2
    assert meta_resumed["n_docs"] == meta_full["n_docs"]
    assert meta_resumed["avgdl"] == meta_full["avgdl"]
    assert meta_resumed["n_postings"] == meta_full["n_postings"]
    assert _index_digest(part_idx) == _index_digest(full_idx)


def test_resume_noop_when_complete(ray_session, tmp_path):
    corpus = str(tmp_path / "turns")
    write_synthetic(corpus, n_turns=200, seed=9, turns_per_block=100)
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(num_partitions=2, term_parts=2, salt_bits=1)
    build_index(corpus, idx, cfg)
    d1 = _index_digest(idx)
    meta2 = build_index(corpus, idx, cfg)
    assert meta2["partitions_built"] == 0
    assert meta2["partitions_skipped"] == 2
    assert _index_digest(idx) == d1


def test_config_change_invalidates_checkpoint(ray_session, tmp_path):
    """Lineage guard: a manifest built under a different analyzer config
    must NOT be reused (SURVEY §7.3)."""
    corpus = str(tmp_path / "turns")
    write_synthetic(corpus, n_turns=200, seed=11, turns_per_block=100)
    idx = str(tmp_path / "idx")
    cfg1 = BuildConfig(num_partitions=2, term_parts=2, salt_bits=1)
    build_index(corpus, idx, cfg1)

    from themis_search_engine_ray.functions.analyzer import AnalyzerConfig

    cfg2 = BuildConfig(
        num_partitions=2, term_parts=2, salt_bits=1,
        analyzer=AnalyzerConfig(use_stemmer=False),
    )
    # wipe outputs but keep manifests to prove they are invalidated
    meta2 = build_index(corpus, idx, cfg2)
    assert meta2["partitions_built"] == 2
    assert meta2["partitions_skipped"] == 0
