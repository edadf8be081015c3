"""Tests for the training-data-pipeline operators (dedup, similarity,
text analysis, multimodal) over the sf0.001 test tables."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _pairs_set(df):
    return {(int(a), int(b)) for a, b in zip(df["a"], df["b"])}


def _brute_jaccard_pairs(threshold=0.5, k=3):
    import pyarrow.parquet as pq

    from themis_search_engine_ray.pipelines.dedup import _shingles

    tab = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(tab["doc_id"].to_pylist(), tab["text"].to_pylist()))
    sets = {d: _shingles(t, k) for d, t in docs}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sets[a], sets[b]
            if not sa and not sb:
                continue
            inter = len(sa & sb)
            j = inter / (len(sa) + len(sb) - inter)
            if j >= threshold:
                out[(a, b)] = j
    return out


def test_ngram_jaccard_exact_vs_bruteforce():
    from themis_search_engine_ray.pipelines.dedup import ngram_jaccard_pairs

    got = ngram_jaccard_pairs(SF).to_pandas()
    want = _brute_jaccard_pairs()
    assert _pairs_set(got) == set(want)


def test_minhash_lsh_recall_and_precision():
    """All reported pairs must be true (verified) pairs; recall of the
    LSH stage vs brute force should be high at j >= 0.5."""
    from themis_search_engine_ray.pipelines.dedup import minhash_pairs

    got = minhash_pairs(SF).to_pandas()
    want = _brute_jaccard_pairs()
    got_pairs = _pairs_set(got)
    assert got_pairs <= set(want)  # verification guarantees precision 1.0
    if want:
        recall = len(got_pairs) / len(want)
        assert recall >= 0.8, recall


def test_simhash_determinism_and_symmetry():
    from themis_search_engine_ray.pipelines.dedup import simhash64, simhash_pairs

    s1 = simhash64("the quick brown fox")
    assert s1 == simhash64("the quick brown fox")
    assert s1 != simhash64("a completely different sentence here")
    df = simhash_pairs(SF).to_pandas()
    assert (df["hamming"] <= 3).all()
    assert (df["a"] < df["b"]).all()


def test_batch_tokenization_matches_scalar_on_unicode():
    """The vectorized shingle/simhash paths must tokenize like the
    scalar verify/oracle paths — lower FIRST, so e.g. U+212A KELVIN
    SIGN ('K'.lower() == 'k') yields a token instead of vanishing."""
    import pyarrow as pa

    from themis_search_engine_ray.pipelines.dedup import (
        _shingle_hashes_batch,
        _shingles,
        shingle_hash_str,
        simhash64,
        simhash64_batch,
    )

    texts = [
        "K hello world foo",  # KELVIN SIGN -> 'k'
        "café au lait",       # é stays non-ASCII (stripped) both ways
        "plain ascii text here",
        "",
    ]
    col = pa.chunked_array([pa.array(texts, pa.string())])
    # simhash: bit-identical per row
    sigs = simhash64_batch(col)
    for i, t in enumerate(texts):
        assert int(sigs[i]) == simhash64(t), t
    # shingles: batch hash set == hash of the scalar string shingles
    d_idx, sh, n = _shingle_hashes_batch(col, 3)
    assert n == len(texts)
    for i, t in enumerate(texts):
        got = {int(h) for h in sh[d_idx == i]}
        want = {shingle_hash_str(s) for s in _shingles(t, 3)}
        assert got == want, t


def test_decontaminate_matches_bruteforce():
    """Broadcast-probe + exact-verify decontamination equals the
    brute-force string-shingle intersection, doc for doc."""
    import pyarrow.parquet as pq

    from themis_search_engine_ray.pipelines.decontaminate import (
        _is_benchmark,
        decontaminate,
    )
    from themis_search_engine_ray.pipelines.dedup import _shingles

    thr, k = "1999", 3  # ~10%: guarantees a non-empty benchmark at sf0.001
    tab = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(tab["doc_id"].to_pylist(), tab["text"].to_pylist()))
    bench = set()
    for d, t in docs:
        if _is_benchmark(d, thr):
            bench |= _shingles(t, k)
    assert bench
    want = {}
    for d, t in docs:
        if _is_benchmark(d, thr):
            continue
        n = len(_shingles(t, k) & bench)
        if n:
            want[d] = n
    got = decontaminate(SF, threshold_hex=thr, k=k).to_pandas()
    assert dict(zip(got["doc_id"], got["n_shared"])) == want
    # the Bloom scale path produces the IDENTICAL exact result
    got_b = decontaminate(SF, threshold_hex=thr, k=k, mode="bloom").to_pandas()
    assert dict(zip(got_b["doc_id"], got_b["n_shared"])) == want


def test_decontaminate_bloom_never_materializes_shingle_set(monkeypatch):
    """mode='bloom' must hold only the fixed-size bitmap on the driver:
    the exact-set builder (whose driver memory IS the shingle set) must
    never run, and the bitmap must survive a tiny FP-heavy sizing."""
    import themis_search_engine_ray.pipelines.decontaminate as dc

    def boom(*a, **k):
        raise AssertionError("benchmark_shingles must not run in bloom mode")

    monkeypatch.setattr(dc, "benchmark_shingles", boom)
    want = dc.decontaminate(SF, threshold_hex="1999", k=3, mode="bloom")
    want = want.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(want) > 0
    # a deliberately tiny bitmap (worst-case FP rate) still gives the
    # exact result — false positives only cost verify work
    tiny = dc.decontaminate(
        SF, threshold_hex="1999", k=3, mode="bloom", n_bits=1024
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert tiny.equals(want)


def test_bloom_fp_rate_is_bounded():
    """Observed false-positive rate of the Bloom filter stays within 2x
    of the theoretical (1 - e^{-kn/m})^k bound."""
    import numpy as np

    from themis_search_engine_ray.pipelines.decontaminate import (
        _bloom_positions,
        _bloom_probe,
        _bloom_set,
    )

    rng = np.random.RandomState(3)
    n_bits, n_hashes, n_in = 1 << 16, 4, 4000
    members = rng.randint(0, 1 << 63, n_in).astype(np.uint64)
    words = np.zeros(n_bits // 64, np.uint64)
    _bloom_set(words, _bloom_positions(members, n_bits, n_hashes))
    # membership: no false negatives, ever
    assert _bloom_probe(words, _bloom_positions(members, n_bits, n_hashes)).all()
    probes = rng.randint(0, 1 << 63, 200_000).astype(np.uint64)
    fp = _bloom_probe(words, _bloom_positions(probes, n_bits, n_hashes)).mean()
    theo = (1.0 - np.exp(-n_hashes * n_in / n_bits)) ** n_hashes
    assert fp <= 2 * theo + 1e-4, (fp, theo)


def test_repetition_scores_match_bruteforce():
    import re

    import pyarrow.parquet as pq

    from themis_search_engine_ray.functions.rounding import round_half_up
    from themis_search_engine_ray.pipelines.text_analysis import repetition_scores

    got = (
        repetition_scores(SF)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    tab = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for d, t in zip(tab["doc_id"].to_pylist(), tab["text"].to_pylist()):
        toks = re.findall(r"[a-z0-9]+", (t or "").lower())
        grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        assert got.loc[d, "n_kgrams"] == len(grams)
        assert got.loc[d, "n_distinct_kgrams"] == len(set(grams))
        want = (
            round_half_up(1.0 - len(set(grams)) / len(grams), 6) if grams else 0.0
        )
        assert got.loc[d, "dup_kgram_frac"] == want


def test_curate_corpus_matches_bruteforce():
    """The composed curation pipeline equals the scalar composition of
    its ingredients (keep-min dedup, held-out drop, decontamination,
    quality floor, shuffle key)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from themis_search_engine_ray.pipelines.curate import curate_corpus
    from themis_search_engine_ray.pipelines.decontaminate import _is_benchmark
    from themis_search_engine_ray.pipelines.dedup import _shingles
    from themis_search_engine_ray.pipelines.shuffle import _shuffle_key
    from themis_search_engine_ray.pipelines.text_analysis import quality_batch

    held_hex, qmin, k = "1999", 0.70, 3
    tab = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(tab["doc_id"].to_pylist(), tab["text"].to_pylist()))
    quality = dict(
        zip(
            tab["doc_id"].to_pylist(),
            quality_batch(tab)["quality_score"].to_numpy(),
        )
    )
    bench = set()
    for d, t in docs:
        if _is_benchmark(d, held_hex):
            bench |= _shingles(t, k)
    by_text: dict[str, list] = {}
    for d, t in docs:
        by_text.setdefault(t or "", []).append(d)
    want = {}
    for t, ids in by_text.items():
        d = min(ids)
        if _is_benchmark(d, held_hex):
            continue
        if _shingles(t, k) & bench:
            continue
        if quality[d] < qmin:
            continue
        want[d] = _shuffle_key(d, 0)
    got = curate_corpus(SF, quality_min=qmin, held_hex=held_hex, k=k).to_pandas()
    assert dict(zip(got["doc_id"], got["shuffle_key"])) == want
    assert 0 < len(want) < len(docs)  # the filters actually bite


def test_exact_dedup_counts():
    from themis_search_engine_ray.pipelines.dedup import exact_dedup

    df = exact_dedup(SF).to_pandas()
    assert len(df) == 500  # all distinct in the test table
    assert df["doc_id"].is_unique


def test_knn_brute_self_consistency():
    from themis_search_engine_ray.pipelines.similarity import knn_brute

    df = knn_brute(SF, k=5, n_queries=5).to_pandas()
    assert set(df["qid"]) == {0, 1, 2, 3, 4}
    for q, grp in df.groupby("qid"):
        assert len(grp) == 5
        assert (grp["vec_id"] != q).all()
        # verify against numpy brute force
        import pyarrow.parquet as pq

        tab = pq.read_table(f"{SF}/embeddings.parquet")
        m = np.vstack([np.asarray(v, np.float64) for v in tab["embedding"].to_pylist()])
        ids = tab["vec_id"].to_numpy()
        n = m / np.linalg.norm(m, axis=1)[:, None]
        qv = n[ids == q][0]
        cos = n @ qv
        cos[ids == q] = -2
        top = ids[np.lexsort((ids, -cos))][:5]
        assert sorted(grp["vec_id"]) == sorted(top.tolist())


def test_sampling_and_query_load_distributed():
    """The distributed centroid sample and partial-min query load must
    be bounded, deterministic, and draw real table rows."""
    import numpy as np
    import pyarrow.parquet as pq

    from themis_search_engine_ray.pipelines.similarity import (
        load_queries,
        sample_embeddings,
    )

    tab = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tab["vec_id"].to_numpy()
    full = {
        int(i): np.asarray(e, np.float64)
        for i, e in zip(ids, tab["embedding"].to_pylist())
    }

    s1 = sample_embeddings(SF, cap=16)
    s2 = sample_embeddings(SF, cap=16)
    assert s1.shape[0] == 16
    assert np.array_equal(s1, s2)  # deterministic (splitmix64 keys)
    rows = {tuple(r) for r in np.round(s1, 9)}
    table_rows = {tuple(r) for r in np.round(np.stack(list(full.values())), 9)}
    assert rows <= table_rows  # every sample row is a real table row

    qids, qmat = load_queries(SF, n_queries=5)
    want = np.sort(ids)[:5]
    assert np.array_equal(qids, want)  # the 5 smallest vec_ids
    for qid, vec in zip(qids, qmat):
        assert np.array_equal(vec, full[int(qid)])


def test_ivf_recall():
    from themis_search_engine_ray.pipelines.similarity import ivf_knn, knn_brute

    brute = knn_brute(SF, k=5, n_queries=10).to_pandas()
    ivf = ivf_knn(SF, k=5, n_queries=10, n_lists=8, nprobe=3).to_pandas()
    b = {(q, v) for q, v in zip(brute["qid"], brute["vec_id"])}
    a = {(q, v) for q, v in zip(ivf["qid"], ivf["vec_id"])}
    recall = len(a & b) / len(b)
    assert recall >= 0.5, recall  # nprobe=3/8 lists


def test_langid_multilingual_samples():
    import pyarrow as pa

    from themis_search_engine_ray.pipelines.text_analysis import LangIdBatcher

    batch = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "the cat is on the table and it is happy",
                "der Hund ist nicht mit der Katze im Haus",
                "le chat est dans la maison avec les enfants",
                "el perro es un animal que vive en la casa",
                "",
                "zxqv wvut qqq",
            ],
        }
    )
    out = LangIdBatcher()(batch).to_pydict()
    assert out["lang_pred"][:4] == ["en", "de", "fr", "es"]
    assert out["lang_pred"][4] == "und"
    assert out["lang_pred"][5] == "und"


def test_fingerprint_properties():
    import pyarrow as pa

    from themis_search_engine_ray.pipelines.text_analysis import FingerprintBatcher

    fb = FingerprintBatcher()
    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    batch = pa.table({"doc_id": [1, 2, 3], "text": [t1, t1, "totally different words here now ok yes"]})
    out = fb(batch).to_pydict()
    assert out["fingerprint"][0] == out["fingerprint"][1]  # deterministic
    assert out["sig64"][0] == out["sig64"][1]
    assert out["fingerprint"][0] != out["fingerprint"][2]
    # containment: a doc containing t1 plus suffix shares most fingerprints
    batch2 = pa.table({"doc_id": [4], "text": [t1 + " lambda mu nu xi"]})
    fp_sup = set(fb(batch2).to_pydict()["fingerprint"][0])
    fp_sub = set(out["fingerprint"][0])
    assert len(fp_sub & fp_sup) / len(fp_sub) >= 0.6


def test_media_pipeline_plumbing():
    from themis_search_engine_ray.pipelines.multimodal import MediaDecoder, media_features

    df = media_features(SF).to_pandas()
    assert len(df) == 500
    assert set(df["media_type"]) == {"image", "audio", "video"}
    assert (df["n_frames"][df["media_type"] == "image"] == 1).all()
    assert df["feature"].map(len).eq(16).all()
    # stub decoder raises cleanly
    import pyarrow as pa

    stub = MediaDecoder(decoder="stub")
    with pytest.raises(NotImplementedError):
        stub(
            pa.table(
                {
                    "media_id": [1],
                    "media_type": ["image"],
                    "payload": [b"xx"],
                    "n_bytes": [2],
                    "checksum": ["x"],
                }
            )
        )


def test_media_resize_and_frame_sampling_geometry():
    """Resize: aspect-preserving fit into the target box, never
    upscaling, floor 1. Frame sampling: k = min(max_frames, n) uniform
    stride indices, strictly within range, non-decreasing, first = 0."""
    import pyarrow as pa

    from themis_search_engine_ray.pipelines.multimodal import (
        FrameSampler,
        MediaResizer,
        frame_samples,
        media_resize,
    )

    # hand-built edge dims: tall, wide, tiny, exactly-target, 1-pixel
    feats = pa.table(
        {
            "media_id": [1, 2, 3, 4, 5],
            "media_type": ["image"] * 5,
            "height": pa.array([1024, 16, 256, 300, 1], pa.int32()),
            "width": pa.array([16, 1024, 256, 4000, 1], pa.int32()),
            "n_frames": pa.array([1, 1, 1, 1, 1], pa.int32()),
        }
    )
    out = MediaResizer(target=256)(feats)
    got = list(
        zip(out["out_height"].to_pylist(), out["out_width"].to_pylist())
    )
    assert got == [(256, 4), (4, 256), (256, 256), (19, 256), (1, 1)]
    assert max(max(p) for p in got) <= 256  # never exceeds the box
    # end-to-end over the fixture: downscale-only invariant
    df = media_resize(SF).to_pandas()
    assert (df["out_height"] <= df[["height", "width"]].max(axis=1).clip(upper=256).where(df["height"] <= 256, 256)).all()
    assert ((df["out_height"] <= df["height"]) & (df["out_width"] <= df["width"])).all()
    assert (df[["out_height", "out_width"]].max(axis=1) <= 256).all()

    fs = FrameSampler(max_frames=4)(
        pa.table(
            {
                "media_id": [7, 8],
                "media_type": ["video", "video"],
                "n_frames": pa.array([10, 3], pa.int32()),
            }
        )
    )
    rows = list(zip(fs["media_id"].to_pylist(), fs["frame_pos"].to_pylist(), fs["frame_idx"].to_pylist()))
    assert rows == [
        (7, 0, 0), (7, 1, 2), (7, 2, 5), (7, 3, 7),
        (8, 0, 0), (8, 1, 1), (8, 2, 2),
    ]
    df = frame_samples(SF).to_pandas()
    g = df.groupby("media_id")
    assert (g["frame_pos"].min() == 0).all()
    assert (g.size() <= 8).all()
    assert (df["frame_idx"] >= 0).all()


def test_quality_and_token_counts_basic():
    import pyarrow as pa

    from themis_search_engine_ray.pipelines.text_analysis import (
        quality_batch,
        token_counts_batch,
    )

    batch = pa.table({"doc_id": [1, 2], "text": ["Hello, world! 42", ""]})
    tc = token_counts_batch(batch).to_pydict()
    assert tc["n_ws_tokens"] == [3, 0]
    assert tc["n_alnum_tokens"] == [3, 0]
    assert tc["n_bpeish_tokens"] == [5, 0]  # hello , world ! 42
    q = quality_batch(batch).to_pydict()
    assert q["n_tokens"] == [3, 0]
    assert q["quality_score"][1] == pytest.approx(0.0, abs=1e-9) or q["quality_score"][1] >= 0


def test_embedding_exact_is_blocked_and_correct():
    """The exact embedding pipeline (blocked cross product) must match a
    driver-side numpy brute force, pair-for-pair and value-for-value."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from themis_search_engine_ray.functions.rounding import round_half_up
    from themis_search_engine_ray.pipelines.dedup import embedding_dup_pairs

    got = embedding_dup_pairs(SF, threshold=0.3).to_pandas()
    tab = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tab["vec_id"].to_numpy()
    flat = pc.list_flatten(tab["embedding"].combine_chunks()).to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    mat = flat.reshape(len(ids), -1)
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    cos = (mat @ mat.T) / n[:, None] / n[None, :]
    want = {}
    ai, bi = np.nonzero(np.triu(cos >= 0.3, k=1))
    for x, y in zip(ai, bi):
        a, b = int(ids[x]), int(ids[y])
        want[(min(a, b), max(a, b))] = float(round_half_up(cos[x, y], 6))
    got_map = {
        (int(a), int(b)): float(c)
        for a, b, c in zip(got["a"], got["b"], got["cosine"])
    }
    assert got_map == want


def test_embedding_lsh_recall_vs_exact():
    """LSH variant: perfect precision (verified cosine), measured recall
    vs the exact pipeline; high-cosine pairs must all be recalled."""
    from themis_search_engine_ray.pipelines.dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    exact = embedding_dup_pairs(SF, threshold=0.3).to_pandas()
    lsh = embedding_dup_pairs_lsh(SF, threshold=0.3).to_pandas()
    exact_pairs = _pairs_set(exact)
    lsh_pairs = _pairs_set(lsh)
    assert lsh_pairs <= exact_pairs  # precision 1.0 (exact verification)
    if exact_pairs:
        recall = len(lsh_pairs) / len(exact_pairs)
        assert recall >= 0.9, recall
    # every pair at cosine >= 0.7 must collide in some band
    strong = {
        (int(a), int(b))
        for a, b, c in zip(exact["a"], exact["b"], exact["cosine"])
        if c >= 0.7
    }
    assert strong <= lsh_pairs


def test_dedup_clusters_are_connected_components():
    """Label propagation must produce exactly the connected components
    (min-id labels) of the verified ngram-jaccard pair graph, with
    singletons labeling themselves."""
    import pyarrow.parquet as pq

    from themis_search_engine_ray.pipelines.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(SF).to_pandas()
    got = dedup_clusters(SF).to_pandas()

    # union-find reference
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for a, b in zip(pairs["a"], pairs["b"]):
        union(int(a), int(b))
    all_ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    # min-id per component
    members: dict[int, list[int]] = {}
    for i in all_ids:
        members.setdefault(find(i), []).append(i)
    want = {}
    for root, ms in members.items():
        lo = min(ms)
        for m in ms:
            want[m] = lo
    got_map = dict(zip(got["doc_id"].astype(int), got["cluster"].astype(int)))
    assert got_map == want
    # sanity: some non-trivial cluster exists on the sf tables
    assert any(v != k for k, v in got_map.items())


def test_relational_pipelines_match_duckdb():
    """TPC-H-shape pipelines (partial-agg Q1, big-big join Q5, top-k
    Q15) match DuckDB on the sf0.001 tables."""
    import duckdb

    from themis_search_engine_ray.pipelines.relational import (
        pricing_summary,
        revenue_by_nation,
        top_suppliers,
    )

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    got = (
        pricing_summary(SF)
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    want = con.execute(
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity),0) sum_qty, "
        "CAST(count(*) AS BIGINT) count_order FROM lineitem "
        "GROUP BY 1,2 ORDER BY 1,2"
    ).df()
    assert (got["count_order"].to_numpy() == want["count_order"].to_numpy()).all()
    assert (got["sum_qty"].to_numpy() == want["sum_qty"].to_numpy()).all()

    rev = revenue_by_nation(SF).to_pandas().set_index("n_name")["revenue"]
    want_rev = con.execute(
        "SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),0) r "
        "FROM lineitem JOIN orders ON l_orderkey=o_orderkey "
        "JOIN customer ON o_custkey=c_custkey "
        "JOIN nation ON c_nationkey=n_nationkey GROUP BY 1"
    ).df().set_index("n_name")["r"]
    assert dict(rev) == dict(want_rev)

    top = top_suppliers(SF, k=5).to_pandas()
    want_top = con.execute(
        "WITH r AS (SELECT l_suppkey, sum(l_extendedprice*(1-l_discount)) rev "
        "FROM lineitem GROUP BY 1) SELECT l_suppkey FROM r "
        "ORDER BY rev DESC, l_suppkey LIMIT 5"
    ).df()
    assert top["s_suppkey"].tolist() == want_top["l_suppkey"].tolist()


def test_clean_text_rules():
    import pyarrow as pa

    from themis_search_engine_ray.pipelines.text_analysis import clean_text_batch

    batch = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "visit https://ex.com/x?a=1 or mail bob@foo.org now",
                "a row a a fast merge 7 x value",
                "  spaced\tout  ",
                "see https://x.com\rhello world",
            ],
        }
    )
    out = clean_text_batch(batch).to_pydict()
    assert out["clean_text"] == [
        "visit or mail now",
        "row fast merge value",
        "spaced out",
        # the URL stops at the stray \r (\S excludes it): 'hello'
        # must survive the scrub
        "see hello world",
    ]
    assert out["n_urls"] == [1, 0, 0, 1]
    assert out["n_emails"] == [1, 0, 0, 0]
    # counts are over the RAW text (the URL's x/a/1 count), so
    # downstream filters see pre-scrub frequencies
    assert out["n_single"] == [3, 5, 0, 1]


def test_pii_redact_rules():
    import pyarrow as pa

    from themis_search_engine_ray.pipelines.text_analysis import pii_redact_batch

    batch = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "mail bob.smith+x@foo.org or call +1 555-123-4567 now",
                "ssn 123-45-6789 card 1234 5678 9012 3456 end",
                "host 192.168.1.100 and (555) 123 4567",
                "no pii here, just words and 12 numbers",
                "card 1234-5678-9012-3456 is NOT two phones",
            ],
        }
    )
    out = pii_redact_batch(batch).to_pydict()
    assert out["redacted_text"] == [
        "mail <EMAIL> or call <PHONE> now",
        "ssn <SSN> card <CC> end",
        "host <IP> and <PHONE>",
        "no pii here, just words and 12 numbers",
        "card <CC> is NOT two phones",
    ]
    assert out["n_email"] == [1, 0, 0, 0, 0]
    assert out["n_ssn"] == [0, 1, 0, 0, 0]
    # the card rule runs BEFORE the phone rule, so a 16-digit grouped
    # number is attributed once (not as two 8-digit phone fragments)
    assert out["n_cc"] == [0, 1, 0, 0, 1]
    assert out["n_phone"] == [1, 0, 1, 0, 0]
    assert out["n_ip"] == [0, 0, 1, 0, 0]


def test_pii_redact_matches_duckdb_oracle():
    """Engine vs the _pii_redact_sql oracle on PII-LADEN synthetic
    text — the sf tables contain zero PII shapes, so this is where the
    RE2-parity contract is actually exercised."""
    import duckdb
    import pyarrow as pa

    import __ray_entry__ as entry
    from themis_search_engine_ray.pipelines.text_analysis import pii_redact_batch

    tbl = pa.table(
        {
            "doc_id": list(range(8)),
            "text": [
                "a@b.io c@d.co twice, +44 20 7946 0958 intl-ish",
                "edge 999.999.999.999 still dotted-quad shaped",
                "adjacent 555-123-4567555-123-4567 digit run",
                "(555)123-4567 tight parens",
                "1234 5678 9012 3456 7890 twenty digits",
                "",
                "plain text only",
                "dot.ted@multi.part.domain.com 10.0.0.1",
            ],
        }
    )
    got = (
        pii_redact_batch(tbl)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    want = (
        con.execute(entry.oracle_sql()["pii_redact"] + " ORDER BY doc_id")
        .df()
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert got[c].tolist() == want[c].tolist(), c


def test_chunk_documents_windows():
    import pyarrow as pa

    from themis_search_engine_ray.pipelines.text_analysis import (
        chunk_documents_batch,
    )

    toks = lambda k: " ".join(f"t{i}" for i in range(k))
    batch = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                toks(5),  # shorter than the window: one chunk
                toks(10),  # 10 tokens, window 6 stride 4: chunks at 0, 4
                toks(6),  # exactly one full window
                "",  # empty: no chunks
                toks(7),  # one token past the window: second chunk
            ],
        }
    )
    out = chunk_documents_batch(batch, max_tokens=6, overlap=2).to_pydict()
    assert out["doc_id"] == [1, 2, 2, 3, 5, 5]
    assert out["chunk_idx"] == [0, 0, 1, 0, 0, 1]
    assert out["n_tokens"] == [5, 6, 6, 6, 6, 3]
    assert out["chunk_text"][1] == "t0 t1 t2 t3 t4 t5"
    # consecutive chunks overlap by exactly `overlap` tokens
    assert out["chunk_text"][2] == "t4 t5 t6 t7 t8 t9"
    assert out["chunk_text"][5] == "t4 t5 t6"


def test_chunk_documents_matches_duckdb_oracle():
    """Engine vs the _chunk_documents_sql oracle on adversarial token
    counts: the exact-boundary, one-past-boundary and empty shapes."""
    import duckdb
    import pyarrow as pa

    import __ray_entry__ as entry
    from themis_search_engine_ray.pipelines.text_analysis import (
        CHUNK_MAX_TOKENS,
        CHUNK_OVERLAP,
        chunk_documents_batch,
    )

    st = CHUNK_MAX_TOKENS - CHUNK_OVERLAP
    counts = [
        0,
        1,
        CHUNK_MAX_TOKENS - 1,
        CHUNK_MAX_TOKENS,
        CHUNK_MAX_TOKENS + 1,
        st,
        2 * st + CHUNK_MAX_TOKENS,
        2 * st + CHUNK_MAX_TOKENS + 1,
        500,
    ]
    tbl = pa.table(
        {
            "doc_id": list(range(len(counts))),
            "text": [" ".join(f"w{i}" for i in range(k)) for k in counts],
        }
    )
    got = (
        chunk_documents_batch(tbl)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    want = (
        con.execute(
            entry.oracle_sql()["chunk_documents"] + " ORDER BY doc_id, chunk_idx"
        )
        .df()
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert got[c].tolist() == want[c].tolist(), c


def test_clean_text_dataset_runs(ray_session):
    from themis_search_engine_ray.pipelines.text_analysis import clean_text

    df = clean_text("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    # the synthetic corpus is full of standalone 'a' tokens
    assert (df["n_single"] > 0).any()
    assert not df["clean_text"].str.contains(r"\b[a-z0-9]\b", regex=True).any()


def test_lsh_knn_full_equals_brute(ray_session):
    """One zero-bit band => all vectors candidates => the LSH-bucketed
    ANN must reproduce exact brute-force top-k row for row (the
    value-exact twin's contract)."""
    from themis_search_engine_ray.pipelines.similarity import (
        knn_brute,
        lsh_knn_full,
    )

    full = (
        lsh_knn_full(SF)
        .to_pandas()
        .sort_values(["qid", "vec_id"])
        .reset_index(drop=True)
    )
    brute = (
        knn_brute(SF)
        .to_pandas()
        .sort_values(["qid", "vec_id"])
        .reset_index(drop=True)
    )
    assert len(full) > 0
    assert full.equals(brute)


def test_lsh_knn_recall(ray_session):
    """Default banding recall@k vs brute (deterministic: seeded
    hyperplanes, deterministic query set). Measured 0.84 on this
    corpus; floor leaves margin for testdata regeneration."""
    from themis_search_engine_ray.pipelines.similarity import knn_brute, lsh_knn

    brute = knn_brute(SF).to_pandas()
    approx = lsh_knn(SF).to_pandas()
    bset = set(zip(brute["qid"], brute["vec_id"]))
    aset = set(zip(approx["qid"], approx["vec_id"]))
    assert len(bset) > 0
    assert len(aset & bset) / len(bset) >= 0.6
    # every emitted cosine is exact: approx rows are a subset of what
    # brute would score for those pairs
    merged = approx.merge(brute, on=["qid", "vec_id"], how="inner")
    assert (merged["cosine_x"] == merged["cosine_y"]).all()


def test_curate_priority_prefers_source(ray_session, tmp_path):
    """Among duplicate texts the kept copy is the argmin of
    (source priority, doc_id); the keep decision follows THAT copy's
    keepable flags; ties on priority fall back to min doc_id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from themis_search_engine_ray.pipelines.curate import curate_corpus

    # long distinct-ish sentences so the quality floor passes; doc 1/2
    # share text A (crawl id 1 < wiki id 2), doc 3/4 share text B with
    # equal priority (tie -> min id)
    text_a = "the quick brown fox jumps over a lazy dog near the old river bank today"
    text_b = "many hands make light work when the whole team pulls in one direction"
    text_c = "a completely different document about distributed query engines and storage"
    tab = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [text_a, text_a, text_b, text_b, text_c],
            "source": ["crawl", "wiki", "forum", "forum", "crawl"],
        }
    )
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    prio = {"wiki": 0, "crawl": 1, "forum": 2}

    plain = set(
        curate_corpus(str(tmp_path), held_hex="0000")
        .to_pandas()["doc_id"]
    )
    pref = set(
        curate_corpus(str(tmp_path), held_hex="0000", source_priority=prio)
        .to_pandas()["doc_id"]
    )
    # plain keep-min: 1 (text A), 3 (text B), 5
    assert plain == {1, 3, 5}
    # priority: wiki copy 2 beats crawl copy 1; forum tie -> min id 3
    assert pref == {2, 3, 5}


def test_curate_priority_validation(ray_session, tmp_path):
    import pytest as _pytest

    from themis_search_engine_ray.pipelines.curate import curate_corpus

    with _pytest.raises(ValueError, match="priorities must be"):
        curate_corpus("/root/testdata/sf0.001", source_priority={"a": 16})
