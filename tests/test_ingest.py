"""JSONL/CSV transcript ingestion → normalized Parquet → full index
build end to end (sources/ingest.py)."""

import json
import os

import pytest

from themis_search_engine_ray.oracle import ThemisOracle
from themis_search_engine_ray.pipelines.index_build import BuildConfig, build_index
from themis_search_engine_ray.sources.ingest import ingest_transcripts
from themis_search_engine_ray.state.searcher import LocalSearchEngine

ROWS = [
    {"conv_id": f"c{i % 5}", "turn_idx": i // 5, "text": f"alpha data beta turn {i} agent response"}
    for i in range(60)
]


def _check_built(idx, rows):
    eng = LocalSearchEngine(idx)
    oracle = ThemisOracle([(r["conv_id"], r["turn_idx"], r["text"]) for r in rows])
    got = [(h.conv_id, h.turn_idx, h.score) for h in eng.search("alpha data", k=10)]
    want = [(h.conv_id, h.turn_idx, h.score) for h in oracle.search("alpha data", k=10)]
    assert got == want


def test_ingest_jsonl_and_build(ray_session, tmp_path):
    src = tmp_path / "turns.jsonl"
    with open(src, "w") as f:
        for r in ROWS:
            f.write(json.dumps(r) + "\n")
    out = str(tmp_path / "norm")
    meta = ingest_transcripts(str(src), out)
    assert meta["rows"] == len(ROWS)
    idx = str(tmp_path / "idx")
    build_index(out, idx, BuildConfig(num_partitions=1, term_parts=2, salt_bits=1))
    _check_built(idx, ROWS)


def test_ingest_csv_drops_null_keys(ray_session, tmp_path):
    src = tmp_path / "turns.csv"
    with open(src, "w") as f:
        f.write("conv_id,turn_idx,text\n")
        for r in ROWS:
            f.write(f"{r['conv_id']},{r['turn_idx']},{r['text']}\n")
        f.write(",,orphan row without keys\n")
    out = str(tmp_path / "norm_csv")
    meta = ingest_transcripts(str(src), out)
    assert meta["rows"] == len(ROWS)  # null-key row dropped
    assert meta["dropped_rows"] == 1  # exact count via the csv re-parse
    idx = str(tmp_path / "idx_csv")
    build_index(out, idx, BuildConfig(num_partitions=1, term_parts=2, salt_bits=1))
    _check_built(idx, ROWS)


def test_ingest_parquet_and_counts(ray_session, tmp_path):
    """Parquet passthrough-normalize: input rows counted from metadata
    (no scan), dropped_rows exact for null-key rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "turns_src"
    os.makedirs(src)
    rows = [dict(r) for r in ROWS] + [
        {"conv_id": None, "turn_idx": 99, "text": "null conv"},
        {"conv_id": "c9", "turn_idx": None, "text": "null turn"},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(src / "part-0.parquet"))
    out = str(tmp_path / "norm_pq")
    meta = ingest_transcripts(str(src / "part-0.parquet"), out)
    assert meta["rows"] == len(ROWS)
    assert meta["dropped_rows"] == 2


def test_ingest_missing_column_raises(ray_session, tmp_path):
    src = tmp_path / "bad.jsonl"
    with open(src, "w") as f:
        f.write(json.dumps({"conv_id": "c0", "text": "no turn idx"}) + "\n")
    with pytest.raises(Exception, match="turn_idx"):
        ingest_transcripts(str(src), str(tmp_path / "bad_out")).get("rows")


def test_ingest_gzip_jsonl(ray_session, tmp_path):
    """Compressed JSONL sources: format inference looks through the
    codec suffix; Ray/Arrow auto-detect gzip for both the parse and the
    line-count metric pass."""
    import gzip
    import json

    from themis_search_engine_ray.sources.ingest import ingest_transcripts

    src = tmp_path / "part0.jsonl.gz"
    with gzip.open(src, "wt") as f:
        for i in range(20):
            f.write(
                json.dumps(
                    {
                        "conv_id": f"c{i}",
                        "turn_idx": 0,
                        "role": "user",
                        "text": f"hello {i}",
                        "tool": None,
                        "ts": "2024-01-01T00:00:00",
                    }
                )
                + "\n"
            )
    out = tmp_path / "norm"
    stats = ingest_transcripts(str(src), str(out))
    assert stats["rows"] == 20
    assert stats["dropped_rows"] == 0
