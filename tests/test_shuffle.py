"""Deterministic resumable corpus shuffle (pipelines/shuffle.py)."""

import hashlib
import os

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _want_order(seed=0):
    tab = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = tab["doc_id"].to_pylist()
    return sorted(
        ids, key=lambda i: hashlib.md5(f"{i}:{seed}".encode()).hexdigest()
    )


def _read_global_order(out_dir):
    order = []
    for f in sorted(os.listdir(out_dir)):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(out_dir, f), columns=["doc_id"])
            order.extend(t["doc_id"].to_pylist())
    return order


def test_shuffle_export_global_order_and_resume(tmp_path):
    from themis_search_engine_ray.pipelines.shuffle import shuffle_export

    out = str(tmp_path / "shuf")
    r1 = shuffle_export(SF, out, seed=0, num_shards=16)
    assert r1["rows"] == 500
    assert r1["shards_written"] + r1["shards_skipped"] >= 1
    # reading shards 0..N-1 in order IS the md5-sorted global shuffle
    assert _read_global_order(out) == _want_order()

    # drop two shards; resume rewrites ONLY them, byte-identical order
    sizes_before = {
        f: os.path.getsize(os.path.join(out, f)) for f in os.listdir(out)
    }
    for victim in ("shard-00003.parquet", "shard-00009.parquet"):
        os.unlink(os.path.join(out, victim))
    r2 = shuffle_export(SF, out, seed=0, num_shards=16)
    assert r2["shards_skipped"] == 14
    assert r2["rows"] == 500
    assert _read_global_order(out) == _want_order()
    for f, sz in sizes_before.items():
        assert os.path.getsize(os.path.join(out, f)) == sz

    # a different seed produces a different (still deterministic) order
    out2 = str(tmp_path / "shuf2")
    shuffle_export(SF, out2, seed=7, num_shards=16)
    assert _read_global_order(out2) == _want_order(seed=7)
    assert _read_global_order(out2) != _want_order(seed=0)

    # resuming with DIFFERENT parameters must refuse, not silently
    # reuse the stale shards as if they were the requested shuffle
    with pytest.raises(ValueError, match="refusing to resume"):
        shuffle_export(SF, out, seed=7, num_shards=16)
    with pytest.raises(ValueError, match="refusing to resume"):
        shuffle_export(SF, out, seed=0, num_shards=32)
    # and an out_dir with parquet but no manifest is rejected too
    out3 = str(tmp_path / "shuf3")
    os.makedirs(out3)
    open(os.path.join(out3, "stray.parquet"), "wb").close()
    with pytest.raises(ValueError, match="no shuffle"):
        shuffle_export(SF, out3, seed=0, num_shards=16)


def test_shuffle_export_keep_ids_filter(tmp_path):
    """keep_ids exports only the requested docs, in their shuffle
    order; resuming with a different keep set refuses (digest pinned)."""
    import numpy as np

    from themis_search_engine_ray.pipelines.shuffle import shuffle_export

    tab = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = tab["doc_id"].to_pylist()
    keep = np.array(sorted(ids)[::3], np.int64)  # every third doc
    out = str(tmp_path / "shuf_keep")
    r = shuffle_export(SF, out, seed=0, num_shards=16, keep_ids=keep)
    assert r["rows"] == len(keep)
    # empty shards are backfilled AND counted: written + skipped == N
    assert r["shards_written"] + r["shards_skipped"] == 16
    want = sorted(
        keep.tolist(),
        key=lambda i: hashlib.md5(f"{i}:0".encode()).hexdigest(),
    )
    assert _read_global_order(out) == want
    with pytest.raises(ValueError, match="refusing to resume"):
        shuffle_export(SF, out, seed=0, num_shards=16, keep_ids=keep[:10])
    with pytest.raises(ValueError, match="refusing to resume"):
        shuffle_export(SF, out, seed=0, num_shards=16)  # unfiltered


def test_shuffle_export_resumes_pre_keepdigest_manifest(tmp_path):
    """A directory exported before the keep_digest field existed (its
    manifest lacks the key) must resume cleanly as 'unfiltered'."""
    import json

    from themis_search_engine_ray.pipelines.shuffle import shuffle_export

    out = str(tmp_path / "shuf_old")
    r1 = shuffle_export(SF, out, seed=0, num_shards=16)
    # rewrite the manifest in the pre-keep_digest format
    mpath = os.path.join(out, "shuffle_manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    del m["keep_digest"]
    with open(mpath, "w") as f:
        json.dump(m, f)
    r2 = shuffle_export(SF, out, seed=0, num_shards=16)
    assert r2["shards_skipped"] == 16 and r2["rows"] == r1["rows"]


def test_pack_offsets_contiguous_stream():
    """Offsets form one contiguous token stream in shuffle order:
    sorted by start_offset, each doc starts exactly where the previous
    ends, the order is the md5 shuffle order, and seq ids match the
    seq_len cuts."""
    import numpy as np

    from themis_search_engine_ray.pipelines.shuffle import pack_offsets

    df = (
        pack_offsets(SF, seed=0, num_shards=16, seq_len=64)
        .to_pandas()
        .sort_values("start_offset")
        .reset_index(drop=True)
    )
    assert len(df) == 500
    starts = df["start_offset"].to_numpy()
    toks = df["n_tokens"].to_numpy()
    assert starts[0] == 0
    assert (starts[1:] == starts[:-1] + toks[:-1]).all()
    assert df["doc_id"].tolist() == _want_order()
    assert (df["start_seq"].to_numpy() == starts // 64).all()
    end_tok = starts + np.maximum(toks, 1) - 1
    assert (df["end_seq"].to_numpy() == end_tok // 64).all()


def test_shuffle_manifest_matches_export(tmp_path):
    from themis_search_engine_ray.pipelines.shuffle import (
        shuffle_export,
        shuffle_manifest,
    )

    man = shuffle_manifest(SF, seed=0, num_shards=16).to_pandas()
    assert len(man) == 500
    assert man["shard"].between(0, 15).all()
    out = str(tmp_path / "shuf")
    shuffle_export(SF, out, seed=0, num_shards=16)
    for s, grp in man.groupby("shard"):
        t = pq.read_table(
            os.path.join(out, f"shard-{int(s):05d}.parquet"),
            columns=["doc_id", "shuffle_key"],
        )
        assert sorted(t["doc_id"].to_pylist()) == sorted(grp["doc_id"])
        keys = t["shuffle_key"].to_pylist()
        assert keys == sorted(keys)  # intra-shard sorted by key


def test_split_export_partitions_the_corpus(ray_session, tmp_path):
    """Exporting every split with the in-pass hash-range filter must
    partition the corpus exactly as dataset_split assigns it, each
    split internally in its global shuffled order."""
    import pyarrow.parquet as pq

    from themis_search_engine_ray.pipelines.sampling import dataset_split
    from themis_search_engine_ray.pipelines.shuffle import shuffle_export

    sf = "/root/testdata/sf0.001"
    fr = {"train": 0.8, "val": 0.2}
    want = dataset_split(sf, fractions=fr, seed=5).to_pandas()
    got = {}
    for name in fr:
        out = tmp_path / name
        stats = shuffle_export(
            sf, str(out), seed=1, num_shards=4, split=(name, fr, 5)
        )
        files = sorted(p for p in out.iterdir() if p.suffix == ".parquet")
        assert len(files) == 4
        tabs = [pq.read_table(f) for f in files]
        keys = [k for t in tabs for k in t["shuffle_key"].to_pylist()]
        assert keys == sorted(keys)  # shards concatenated = global order
        ids = {i for t in tabs for i in t["doc_id"].to_pylist()}
        assert stats["rows"] == len(ids)
        got[name] = ids
    assert got["train"] & got["val"] == set()
    for name in fr:
        assert got[name] == set(
            want.loc[want["split"] == name, "doc_id"]
        )


def test_split_export_resume_refuses_other_split(ray_session, tmp_path):
    from themis_search_engine_ray.pipelines.shuffle import shuffle_export

    sf = "/root/testdata/sf0.001"
    fr = {"train": 0.8, "val": 0.2}
    out = tmp_path / "x"
    shuffle_export(sf, str(out), seed=1, num_shards=2, split=("train", fr, 0))
    with pytest.raises(ValueError, match="refusing to resume"):
        shuffle_export(sf, str(out), seed=1, num_shards=2, split=("val", fr, 0))


def test_shuffle_export_wide_shard_space(tmp_path):
    """num_shards > 256 (two-byte key prefixes): global order still
    holds, resume still skips, and the one-byte rule for small N is
    unchanged (what the SQL oracles encode)."""
    import numpy as np

    from themis_search_engine_ray.pipelines.shuffle import (
        _assign_keys,
        shuffle_export,
    )

    out = str(tmp_path / "wide")
    r1 = shuffle_export(SF, out, seed=0, num_shards=1024)
    assert r1["rows"] == 500
    assert r1["shards_written"] + r1["shards_skipped"] == 1024
    # reading shards 0..N-1 in order IS the md5-sorted global shuffle
    assert _read_global_order(out) == _want_order()

    # shard index must be monotone in shuffle_key (contiguous ranges)
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    keys, shards = _assign_keys(ids, 0, 1024)
    keys = keys.to_pylist() if hasattr(keys, "to_pylist") else list(keys)
    order = np.argsort(np.asarray(keys))
    assert (np.diff(shards[order]) >= 0).all()
    # two-byte rule: shard == int(key[:4], 16) * N // 65536
    assert all(
        s == int(k[:4], 16) * 1024 // 65536 for k, s in zip(keys, shards)
    )
    # one-byte rule for N <= 256 is UNCHANGED by the widening
    _, shards16 = _assign_keys(ids, 0, 16)
    assert all(
        s == int(k[:2], 16) * 16 // 256 for k, s in zip(keys, shards16)
    )

    # resume at the wide shard count: drop two shards, only they rewrite
    victims = sorted(
        f for f in os.listdir(out)
        if f.endswith(".parquet") and os.path.getsize(os.path.join(out, f))
    )[:2]
    for v in victims:
        os.unlink(os.path.join(out, v))
    r2 = shuffle_export(SF, out, seed=0, num_shards=1024)
    assert r2["shards_skipped"] == 1022
    assert _read_global_order(out) == _want_order()

    with pytest.raises(ValueError, match="num_shards"):
        shuffle_export(SF, str(tmp_path / "x"), seed=0, num_shards=65537)


def test_export_jsonl_roundtrip_and_resume(ray_session, tmp_path):
    """JSONL conversion preserves shard order/content, is resumable by
    file, and gzip output is byte-identical across reruns."""
    import gzip
    import json
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from themis_search_engine_ray.pipelines.shuffle import (
        export_jsonl,
        shuffle_export,
    )

    docs = pa.table(
        {
            "doc_id": pa.array(range(64), pa.int64()),
            "text": pa.array([f"doc {i} körpus" for i in range(64)], pa.string()),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(docs, str(sf / "documents.parquet"))
    shard_dir = str(tmp_path / "shards")
    shuffle_export(str(sf), shard_dir, seed=1, num_shards=4)

    out = str(tmp_path / "jsonl")
    st1 = export_jsonl(shard_dir, out)
    assert st1["files_written"] == 4 and st1["rows"] == 64
    # shard order preserved: concatenated jsonl == concatenated parquet
    got = []
    for f in sorted(os.listdir(out)):
        with open(os.path.join(out, f)) as fh:
            got.extend(json.loads(line) for line in fh)
    exp = []
    for f in sorted(os.listdir(shard_dir)):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(shard_dir, f)).drop_columns(
                ["shuffle_key"]
            )
            exp.extend(t.to_pylist())
    assert got == exp
    # resume: second run rewrites nothing
    st2 = export_jsonl(shard_dir, out)
    assert st2["files_written"] == 0 and st2["files_skipped"] == 4

    # gzip determinism: two fresh runs, identical bytes
    g1, g2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    export_jsonl(shard_dir, g1, compression="gzip")
    export_jsonl(shard_dir, g2, compression="gzip")
    for f in sorted(os.listdir(g1)):
        assert f.endswith(".jsonl.gz")
        assert (
            open(os.path.join(g1, f), "rb").read()
            == open(os.path.join(g2, f), "rb").read()
        )
    with gzip.open(os.path.join(g1, sorted(os.listdir(g1))[0]), "rt") as fh:
        first = json.loads(fh.readline())
    assert set(first) == {"doc_id", "text"}
