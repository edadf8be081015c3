"""Source-overlap contamination matrix and the exactly-k deterministic
sample: semantics vs brute-force references on crafted corpora, plus
the invariants the scale paths rely on (shard-count invariance for the
overlap, batch-split invariance / semilattice property for bottom-k)."""

import hashlib
import re
from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq

from themis_search_engine_ray.pipelines import dedup, sampling

_TOK = re.compile(r"[a-z0-9]+")


def _write_docs(tmp_path, texts, sources):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "source": pa.array(sources, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def _overlap_reference(texts, sources, k=3):
    by_src = defaultdict(set)
    for t, s in zip(texts, sources):
        toks = _TOK.findall((t or "").lower())
        by_src[s if s is not None else ""].update(
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        )
    out = {}
    srcs = sorted(by_src)
    for i, a in enumerate(srcs):
        for b in srcs[i:]:
            n = len(by_src[a] & by_src[b])
            if n:
                out[(a, b)] = n
    return out


def test_source_overlap_matches_reference(ray_session, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox sleeps all day",  # shares 'the quick brown' etc
        "completely different words entirely here now",
        "the quick brown fox jumps over the lazy dog",  # dup of doc 0, other src
        "short one",  # < k tokens -> no shingles
    ]
    sources = ["web", "web", "books", "forums", "forums"]
    sf = _write_docs(tmp_path, texts, sources)
    got = dedup.source_overlap(sf).to_pandas()
    ref = _overlap_reference(texts, sources)
    assert {
        (r.src_a, r.src_b): r.n_shared for r in got.itertuples()
    } == ref
    # diagonal present for every source with >=1 shingle, and the
    # cross-source dup registered under the ordered pair
    assert ("books", "books") in ref and ("forums", "web") in ref


def test_source_overlap_shard_invariance(ray_session, tmp_path):
    texts = ["alpha beta gamma delta"] * 4 + ["alpha beta gamma epsilon zeta"]
    sources = ["a", "b", "a", "c", "b"]
    sf = _write_docs(tmp_path, texts, sources)

    def as_dict(df):
        return {(r.src_a, r.src_b): r.n_shared for r in df.itertuples()}

    one = as_dict(dedup.source_overlap(sf, num_shards=1).to_pandas())
    many = as_dict(dedup.source_overlap(sf, num_shards=64).to_pandas())
    assert one == many == _overlap_reference(texts, sources)


def _bottomk_reference(ids, k):
    keyed = sorted((hashlib.md5(str(i).encode()).hexdigest(), i) for i in ids)
    return keyed[:k]


def test_sample_exact_k_matches_reference(ray_session, tmp_path):
    ids = list(range(1000))
    sf = _write_docs(tmp_path, ["x"] * len(ids), ["s"] * len(ids))
    got = sampling.sample_exact_k(sf, k=37).to_pandas()
    ref = _bottomk_reference(ids, 37)
    assert len(got) == 37
    assert sorted(zip(got.sample_key, got.doc_id)) == ref


def test_sample_exact_k_is_semilattice(ray_session):
    """bottomk(bottomk(A) ∪ bottomk(B)) == bottomk(A ∪ B) — the
    property that lets each batch reduce to ≤ k rows independently."""
    a, b = list(range(0, 500)), list(range(500, 1000))
    k = 25
    merged = sorted(_bottomk_reference(a, k) + _bottomk_reference(b, k))[:k]
    assert merged == _bottomk_reference(a + b, k)


def test_sample_exact_k_fewer_rows_than_k(ray_session, tmp_path):
    sf = _write_docs(tmp_path, ["x"] * 5, ["s"] * 5)
    got = sampling.sample_exact_k(sf, k=100).to_pandas()
    assert len(got) == 5


def test_sample_per_source_stratified(ray_session, tmp_path):
    """Exactly k per source (fewer for small sources), each source's
    picks = the k smallest md5 keys among ITS docs."""
    sources = ["a"] * 50 + ["b"] * 50 + ["tiny"] * 2
    sf = _write_docs(tmp_path, ["x"] * len(sources), sources)
    got = sampling.sample_per_source(sf, k=5).to_pandas()
    by_src = got.groupby("source").doc_id.apply(list).to_dict()
    assert len(by_src["a"]) == 5 and len(by_src["b"]) == 5
    assert len(by_src["tiny"]) == 2
    for src, picked in by_src.items():
        ids = [i for i, s in enumerate(sources) if s == src]
        ref = [i for _, i in _bottomk_reference(ids, 5)]
        assert sorted(picked) == sorted(ref)


def _quantile_cont_ref(vals, q):
    vals = sorted(vals)
    n = len(vals)
    if n == 1:
        return float(vals[0])
    rn = (n - 1) * q
    lo, hi = int(rn // 1), -(-rn // 1)
    return float(vals[int(lo)]) + (rn - lo) * (
        float(vals[int(hi)]) - float(vals[int(lo)])
    )


def test_length_filter_matches_reference(ray_session, tmp_path):
    from themis_search_engine_ray.pipelines import text_analysis as ta

    # token counts 1..40 (interpolated thresholds land between ints)
    texts = [" ".join(["tok"] * n) for n in range(1, 41)]
    sf = _write_docs(tmp_path, texts, ["s"] * len(texts))
    got = ta.length_filter(sf, lo_q=0.1, hi_q=0.9).to_pandas()
    counts = list(range(1, 41))
    lo = _quantile_cont_ref(counts, 0.1)
    hi = _quantile_cont_ref(counts, 0.9)
    ref = {i for i, n in enumerate(counts) if lo <= n <= hi}
    assert set(got.doc_id) == ref
    assert dict(zip(got.doc_id, got.n_tokens)) == {
        i: counts[i] for i in ref
    }


def test_length_filter_single_doc(ray_session, tmp_path):
    from themis_search_engine_ray.pipelines import text_analysis as ta

    sf = _write_docs(tmp_path, ["one two three"], ["s"])
    got = ta.length_filter(sf).to_pandas()
    assert list(got.doc_id) == [0] and list(got.n_tokens) == [3]


def _write_embeddings(tmp_path, vecs, labels):
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    return str(tmp_path)


def test_knn_label_consistency_matches_brute(ray_session, tmp_path):
    """Crafted 2-D clusters: majority vote, self-exclusion, smallest-
    label vote tie-break — checked against an O(n²) numpy reference,
    and invariant to the chunk size (multi-chunk block cross product
    == single chunk)."""
    import numpy as np

    from themis_search_engine_ray.pipelines import similarity

    rng = np.random.RandomState(5)
    vecs, labels = [], []
    for lab, center in ((0, (1.0, 0.0)), (1, (0.0, 1.0)), (2, (-1.0, 0.3))):
        for _ in range(7):
            v = np.asarray(center) + rng.normal(scale=0.05, size=2)
            vecs.append(v.astype(np.float32).tolist())
            labels.append(lab)
    sf = _write_embeddings(tmp_path, vecs, labels)

    def brute(k):
        m = np.asarray(vecs, np.float64)
        m = m / np.linalg.norm(m, axis=1)[:, None]
        cos = m @ m.T
        out = {}
        ids = np.arange(len(vecs))
        for i in ids:
            sel = np.lexsort((ids, -cos[i]))
            sel = sel[sel != i][:k]
            votes = {}
            for j in sel:
                votes[labels[j]] = votes.get(labels[j], 0) + 1
            pred = sorted(votes.items(), key=lambda x: (-x[1], x[0]))[0]
            out[i] = (labels[i], pred[0], pred[1])
        return out

    ref = brute(5)
    for chunk_rows in (10_000, 4):  # single-chunk vs 6-chunk cross product
        got = similarity.knn_label_consistency(
            sf, k=5, chunk_rows=chunk_rows
        ).to_pandas()
        assert {
            r.vec_id: (r.label, r.predicted, r.n_votes) for r in got.itertuples()
        } == ref


def test_props_field_stats_semantics(ray_session, tmp_path):
    import pandas as pd

    rows = pd.DataFrame(
        {
            "event_type": ["a", "a", "b", "b", None],
            "props": ['{"k": 3}', '{"k": -2}', '{"j": 9}', '{"k": 7}', '{"k": 1}'],
        }
    )
    pq.write_table(pa.Table.from_pandas(rows), str(tmp_path / "events.parquet"))
    from themis_search_engine_ray.pipelines import windows

    got = windows.props_field_stats(str(tmp_path)).to_pandas()
    by = {r.event_type: (r.n_events, r.sum_v, r.min_v, r.max_v) for r in got.itertuples()}
    # 'b' has one row without "k" -> excluded; NULL event_type counts as ""
    assert by == {"a": (2, 1, -2, 3), "b": (1, 7, 7, 7), "": (1, 1, 1, 1)}


def test_length_quantiles_by_source(ray_session, tmp_path):
    """Per-source quantile_cont over token counts, vs the expanded
    reference per source."""
    from themis_search_engine_ray.pipelines import text_analysis as ta

    texts = [" ".join(["t"] * n) for n in (1, 2, 3, 4)] + [
        " ".join(["t"] * n) for n in (10, 20)
    ]
    sources = ["a"] * 4 + ["b"] * 2
    sf = _write_docs(tmp_path, texts, sources)
    got = ta.length_quantiles_by_source(sf).to_pandas().set_index("source")
    assert got.loc["a", "n_docs"] == 4
    assert got.loc["a", "q50"] == _quantile_cont_ref([1, 2, 3, 4], 0.5)
    assert got.loc["a", "q95"] == _quantile_cont_ref([1, 2, 3, 4], 0.95)
    assert got.loc["b", "q25"] == _quantile_cont_ref([10, 20], 0.25)


def test_dedup_rate_by_source_semantics(ray_session, tmp_path):
    """Duplicates counted per source; NULL source under ''."""
    from themis_search_engine_ray.pipelines import dedup as dd

    texts = ["a", "a", "a", "b", "x", "y", "x", "z"]
    sources = ["s1", "s1", "s1", "s1", "s2", "s2", None, None]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "source": pa.array(sources, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = dd.dedup_rate_by_source(str(tmp_path)).to_pandas()
    by = {
        r.source: (r.n_docs, r.n_distinct, r.dup_rate) for r in got.itertuples()
    }
    assert by == {
        "s1": (4, 2, 0.5),
        "s2": (2, 2, 0.0),
        "": (2, 2, 0.0),
    }


def test_retention_cohorts_semantics(ray_session, tmp_path):
    """Crafted cohorts: users keyed to their first-event week; distinct
    users per (cohort, active week); invariant to shard count."""
    from themis_search_engine_ray.pipelines import windows

    wk = 7 * 86400 * 1_000_000
    # u1: weeks 0,1,2 ; u2: weeks 0,2 ; u3: week 1 only ; u4: week 2
    rows = [
        (1, 0), (1, wk), (1, 2 * wk), (1, 10),  # dup week-0 event
        (2, 100), (2, 2 * wk + 5),
        (3, wk + 50),
        (4, 2 * wk + 9),
    ]
    tab = pa.table(
        {
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "ts": pa.array([t for _, t in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    expect = {
        (0, 0): 2,  # u1, u2
        (0, 1): 1,  # u1
        (0, 2): 2,  # u1, u2
        (1, 1): 1,  # u3
        (2, 2): 1,  # u4
    }
    for shards in (1, 64):
        got = windows.retention_cohorts(str(tmp_path), num_shards=shards).to_pandas()
        assert {
            (r.cohort_week, r.active_week): r.n_users for r in got.itertuples()
        } == expect


def test_ngram_novelty_matches_brute(ray_session, tmp_path):
    """Novelty vs a brute shingle-count reference: exact duplicates
    score 0, fully unique docs score 1, partial overlap in between;
    docs shorter than k emit no row."""
    from themis_search_engine_ray.pipelines import dedup as dd

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",  # exact dup -> 0
        "completely novel words appearing only here today friends",
        "the quick brown cat sits under the heavy table",  # shares 'the quick brown'
        "too short",  # < 3 tokens -> no row
        "",
    ]
    sf = _write_docs(tmp_path, texts, ["s"] * len(texts))
    got = dd.ngram_novelty(sf).to_pandas()
    counts = defaultdict(int)
    per_doc = []
    for t in texts:
        toks = _TOK.findall((t or "").lower())
        sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        per_doc.append(sh)
        for s in sh:
            counts[s] += 1
    ref = {}
    for d, sh in enumerate(per_doc):
        if sh:
            uniq = sum(1 for s in sh if counts[s] == 1)
            ref[d] = (len(sh), round((len(sh) - (len(sh) - uniq)) / len(sh), 6))
    got_d = {r.doc_id: (r.n_shingles, r.novelty) for r in got.itertuples()}
    assert set(got_d) == set(ref)
    for d in ref:
        assert got_d[d][0] == ref[d][0]
    assert got_d[0][1] == 0.0 and got_d[1][1] == 0.0
    assert got_d[2][1] == 1.0
    assert 0.0 < got_d[3][1] < 1.0


def test_lang_by_source_composes_lang_id(ray_session, tmp_path):
    """The cross-tab equals the row-level LangIdBatcher composed with
    a pandas groupby; NULL source counts under ''."""
    import pandas as pd

    from themis_search_engine_ray.pipelines import text_analysis as ta

    texts = [
        "the quick brown fox and the lazy dog are here",
        "der schnelle braune fuchs und der faule hund",
        "le renard brun rapide et le chien paresseux",
        "12345 67890",  # no profile hits -> 'und'
    ] * 2
    sources = ["s1", "s1", "s2", None] * 2
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "source": pa.array(sources, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = ta.lang_by_source(str(tmp_path)).to_pandas()
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    preds = ta.LangIdBatcher()(batch)["lang_pred"].to_pylist()
    ref = (
        pd.DataFrame({"source": [s or "" for s in sources], "lang_pred": preds})
        .groupby(["source", "lang_pred"])
        .size()
        .to_dict()
    )
    assert {
        (r.source, r.lang_pred): r.n_docs for r in got.itertuples()
    } == ref
    assert ("", "und") in ref  # the NULL-source bucket exists


def test_vocab_growth_matches_reference(ray_session, tmp_path):
    """Heaps curve vs a running-set reference; terms repeated in later
    docs never count twice, thresholds below any content drop out."""
    from themis_search_engine_ray.pipelines import text_analysis as ta

    texts = ["alpha beta", "beta gamma", "alpha delta epsilon", "zeta"]
    sf = _write_docs(tmp_path, texts, ["s"] * len(texts))
    got = ta.vocab_growth(sf, thresholds=(1, 2, 3, 4, 100)).to_pandas()
    seen, ref = set(), {}
    for i, t in enumerate(texts):
        seen.update(re.findall(r"[a-z0-9]+", t.lower()))
        ref[i + 1] = len(seen)
    expect = {1: ref[1], 2: ref[2], 3: ref[3], 4: ref[4], 100: ref[4]}
    assert dict(zip(got.n_docs, got.n_terms)) == expect


def test_quality_percentile_tie_semantics(ray_session, tmp_path):
    """percent_rank(): ties share the MIN rank, (rank-1)/(N-1)."""
    from themis_search_engine_ray.pipelines import text_analysis as ta

    # two empty docs score identically (ties); others differ
    texts = ["", "", "the quick brown fox is here today", "a b c d e f g"]
    sf = _write_docs(tmp_path, texts, ["s"] * len(texts))
    got = ta.quality_percentile(sf).to_pandas().sort_values("doc_id")
    scores = list(got.quality_score)
    n = len(scores)
    for i, s in enumerate(scores):
        cl = sum(1 for x in scores if x < s)
        assert got.pct_rank.iloc[i] == round(cl / (n - 1), 6)
    # the two tied docs share one pct_rank
    tied = got[got.quality_score == scores[0]]
    assert len(set(tied.pct_rank)) == 1


def test_split_by_cluster_no_leakage(ray_session, tmp_path):
    """Near-duplicate documents always land in the SAME split, and
    singleton clusters reproduce dataset_split's rule keyed on the
    label (= their own doc_id)."""
    import numpy as np

    from themis_search_engine_ray.pipelines.sampling import (
        _GOLDEN,
        _U64,
        split_boundaries,
    )
    from themis_search_engine_ray.pipelines.similarity import _splitmix64

    base = "the quick brown fox jumps over the lazy sleeping dog today"
    texts = [base, base + " extra"] + [
        f"unique document number {i} with its very own distinct content entirely"
        for i in range(8)
    ]
    sf = _write_docs(tmp_path, texts, ["s"] * len(texts))
    got = sampling.split_by_cluster(sf).to_pandas()
    by_doc = dict(zip(got.doc_id, got.split))
    cl = dict(zip(got.doc_id, got.cluster))
    # docs 0 and 1 are near-dups (jaccard >= 0.5) -> same cluster, same split
    assert cl[0] == cl[1] == 0
    assert by_doc[0] == by_doc[1]
    # every row's split matches the pure splitmix rule of its label
    bounds = split_boundaries({"train": 0.9, "val": 0.05, "test": 0.05})
    uppers = np.asarray([b for _, b in bounds], np.uint64)
    names = [n for n, _ in bounds]
    for d, c in cl.items():
        with np.errstate(over="ignore"):
            h = _splitmix64(np.asarray([c], np.uint64))[0]
        assert by_doc[d] == names[int(np.searchsorted(uppers, h))]
