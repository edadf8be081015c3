"""Fulltext-engine query pipelines over an sf_dir (driver contract).

These wrap the index build + BM25 serving into per-call pipelines over
the transcripts derived from ``{sf_dir}/documents.parquet``
(:func:`..sources.transcripts.from_documents` — text passthrough, so
DuckDB oracles can re-derive the identical corpus from the
pre-registered ``documents`` view).

Indexes are built once per (sf_dir, analyzer-config) into a /tmp cache
directory; the build's own per-partition manifest makes the cache a
resume, not a special case.

Fixed evaluation queries are drawn from the documents vocabulary and
include: multi-term, stopword-laden, hot-term (negative idf), unknown
terms, and duplicate terms.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from ..functions.analyzer import AnalyzerConfig
from ..functions.rounding import round_half_up
from ..sources.transcripts import from_documents
from ..stages.tokenize import DocStatsBatcher

EVAL_QUERIES = [
    "spark join order window",
    "the customer line data",
    "merge sort batch stream stream",
    "vector hash group aggregate",
    "scan filter query unknownzz",
]

PHRASE_QUERIES = [
    "order line",
    "the customer query",  # leading stopword keeps its token slot
    "scan fast table",
    "data",
    "value table part",
    "zzznope phrase",  # unknown stem -> unmatchable
]

BASE_TMP = "/tmp/themis_idx_cache"


_LAYOUT_VERSION = 3  # bump when the on-disk index layout changes


def build_or_get_index(sf_dir: str, cfg: AnalyzerConfig, with_role: bool = False):
    """Build (or reuse via manifest-resume) the index for sf_dir's derived
    transcripts under /tmp; returns index dir."""
    from .index_build import BuildConfig, build_index

    bcfg = BuildConfig(
        salt_bits=2, term_parts=4, num_partitions=1, analyzer=cfg, with_role=with_role
    )
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{bcfg.fingerprint()}|v{_LAYOUT_VERSION}".encode()
    ).hexdigest()[:16]
    idx = os.path.join(BASE_TMP, key)
    # materialize derived transcripts once next to the index (lineage input)
    turns_dir = os.path.join(idx, "turns")
    if not os.path.isdir(turns_dir) or not os.listdir(turns_dir):
        from_documents(sf_dir).write_parquet(turns_dir)
    build_index(turns_dir, idx, bcfg)  # resume-skips if complete
    return idx


def turns_passthrough(sf_dir: str):
    """Per-turn text-equality surface: the derived corpus itself."""
    return from_documents(sf_dir)


def doc_stats(sf_dir: str):
    """(conv_id, turn_idx, dl) — BM25 doc lengths."""
    return from_documents(sf_dir).map_batches(
        DocStatsBatcher(AnalyzerConfig(), salt_bits=2),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(["conv_id", "turn_idx", "dl"])


def _term_df(sf_dir: str, cfg: AnalyzerConfig):
    from ray.data.aggregate import Sum

    from ..stages.tokenize import analyze_batch

    def partial_df(batch: pa.Table) -> pa.Table:
        # vectorized M1-M8 fast path: df per stem = #(doc, stem) pairs
        # (identical to counting analyze_doc(t).tfs keys per doc)
        _, _, pair_stem, stems, _, _, _, _ = analyze_batch(
            batch["text"], cfg, with_positions=False, with_tf=False
        )
        df = np.bincount(pair_stem, minlength=len(stems)).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "term": pa.array(stems, pa.string()),
                "df_part": pa.array(df),
            }
        )

    return (
        from_documents(sf_dir)
        .map_batches(partial_df, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("df_part", alias_name="df"))
    )


def term_df_nostem(sf_dir: str):
    """(term, df) without stemming — SQL-oracle-checkable."""
    return _term_df(sf_dir, AnalyzerConfig(use_stemmer=False))


def term_df(sf_dir: str):
    """(term, df) with Porter stemming (pytest-verified vs oracle)."""
    return _term_df(sf_dir, AnalyzerConfig())


def term_df_nostem_nostop(sf_dir: str):
    """(term, df) with BOTH analyzer toggles off — isolates the M3
    stopword filter the way term_df_nostem isolates the stemmer
    (AnalyzerConfig(use_stopwords=False) honored end to end,
    SQL-oracle-checkable)."""
    return _term_df(
        sf_dir, AnalyzerConfig(use_stemmer=False, use_stopwords=False)
    )


def _bm25(
    sf_dir: str,
    cfg: AnalyzerConfig,
    k: int | None,
    round_to: int | None,
    distributed: bool = False,
):
    """``distributed=True`` serves through the ``SearchEngine`` actor
    pool (shard actors + driver merge — the cluster serving topology)
    instead of the in-process ``LocalSearchEngine``; results are
    bit-identical by the actor-packing-invariance contract
    (tests/test_engine_topology.py), so either path satisfies the same
    oracle."""
    import pandas as pd

    from ..state.searcher import LocalSearchEngine, SearchEngine

    idx = build_or_get_index(sf_dir, cfg)
    eng = SearchEngine(idx) if distributed else LocalSearchEngine(idx)
    rows = []
    try:
        for qid, q in enumerate(EVAL_QUERIES):
            hits = eng.search(q, k=k if k is not None else 1 << 30)
            for rank, h in enumerate(hits):
                rows.append(
                    (
                        qid,
                        rank,
                        h.conv_id,
                        h.turn_idx,
                        round_half_up(h.score, round_to) if round_to else h.score,
                    )
                )
    finally:
        if distributed:
            eng.close()  # release the shard actors
    df = pd.DataFrame(rows, columns=["qid", "rank", "conv_id", "turn_idx", "score"])
    df["qid"] = df["qid"].astype("int64")
    df["rank"] = df["rank"].astype("int64")
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def bm25_all_nostem(sf_dir: str):
    """All OR-matched docs scored for the fixed query set, stemmer off,
    scores rounded to 4 (SQL-oracle-checkable; no top-k boundary)."""
    df = _bm25(sf_dir, AnalyzerConfig(use_stemmer=False), k=None, round_to=4)
    return df.drop(columns=["rank"])


def bm25_role_nostem(sf_dir: str, role: str = "assistant"):
    """Role-filtered BM25 (fielded search): all OR-matched docs of one
    role, stemmer off, rounded to 4 (SQL-oracle-checkable — the filter
    commutes with scoring, BM25 stats stay corpus-global)."""
    import pandas as pd

    from ..state.searcher import LocalSearchEngine

    idx = build_or_get_index(sf_dir, AnalyzerConfig(use_stemmer=False), with_role=True)
    eng = LocalSearchEngine(idx)
    rows = []
    for qid, q in enumerate(EVAL_QUERIES):
        for h in eng.search(q, k=1 << 30, role=role):
            rows.append((qid, h.conv_id, h.turn_idx, round_half_up(h.score, 4)))
    df = pd.DataFrame(rows, columns=["qid", "conv_id", "turn_idx", "score"])
    df["qid"] = df["qid"].astype("int64")
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def bm25_all_abs_nostem(sf_dir: str):
    """The reference's *no-topk* BM25 variant: |score| of the accumulated
    sum (OkapiBM25.java:167, K5 quirk), stemmer off, rounded to 4."""
    df = _bm25(sf_dir, AnalyzerConfig(use_stemmer=False), k=None, round_to=None)
    df["score"] = df["score"].abs().map(lambda s: round_half_up(s, 4))
    return df.drop(columns=["rank"])


def bm25_topk(sf_dir: str, k: int = 10):
    """Canonical engine output: stemmed BM25 top-k with ranks (verified
    rank-identical + bit-exact vs the Python oracle in pytest; the
    driver records a rows-only check)."""
    return _bm25(sf_dir, AnalyzerConfig(), k=k, round_to=None)


def _topk_rounded(df, k: int):
    """Deterministic per-qid top-k on the ROUNDED score with the
    engine's tie-break (score desc, conv asc, turn asc) — selection by
    a value both the engine and the SQL oracle provably share (the
    *_all_nostem hash matches), so the k boundary can never flip on a
    sub-rounding float difference. The exact-score top-k path stays
    covered bit-exactly in pytest (bm25_topk / vsm_topk / phrase_topk)."""
    df = df.sort_values(
        ["qid", "score", "conv_id", "turn_idx"],
        ascending=[True, False, True, True],
        kind="mergesort",
    ).reset_index(drop=True)
    df["rank"] = df.groupby("qid").cumcount().astype("int64")
    return df[df["rank"] < k].reset_index(drop=True)


def bm25_topk_nostem(sf_dir: str, k: int = 10):
    """SQL-oracle-checkable top-k: nostem BM25 over all OR matches,
    rounded to 4, ranked deterministically (see :func:`_topk_rounded`).
    Served through the DISTRIBUTED ``SearchEngine`` actor pool, so the
    driver gate exercises the cluster serving topology, not just the
    in-process engine (which every other fulltext entry still covers)."""
    df = _bm25(
        sf_dir, AnalyzerConfig(use_stemmer=False), k=None, round_to=4,
        distributed=True,
    )
    return _topk_rounded(df.drop(columns=["rank"]), k)


def _phrase(sf_dir: str, cfg: AnalyzerConfig, k: int | None, round_to: int | None):
    import pandas as pd

    from ..state.searcher import LocalSearchEngine

    idx = build_or_get_index(sf_dir, cfg)
    eng = LocalSearchEngine(idx)
    rows = []
    for qid, q in enumerate(PHRASE_QUERIES):
        hits = eng.search_phrase(q, k=k if k is not None else 1 << 30)
        for rank, h in enumerate(hits):
            rows.append(
                (
                    qid,
                    rank,
                    h.conv_id,
                    h.turn_idx,
                    round_half_up(h.score, round_to) if round_to else h.score,
                )
            )
    df = pd.DataFrame(rows, columns=["qid", "rank", "conv_id", "turn_idx", "score"])
    df["qid"] = df["qid"].astype("int64")
    df["rank"] = df["rank"].astype("int64")
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def phrase_all_nostem(sf_dir: str):
    """All exact-phrase matches (positional index), stemmer off, BM25
    scores over the phrase stems rounded to 4 (SQL-oracle-checkable)."""
    df = _phrase(sf_dir, AnalyzerConfig(use_stemmer=False), k=None, round_to=4)
    return df.drop(columns=["rank"])


def phrase_topk(sf_dir: str, k: int = 10):
    """Stemmed exact-phrase top-k (pytest-verified vs the oracle)."""
    return _phrase(sf_dir, AnalyzerConfig(), k=k, round_to=None)


def phrase_topk_nostem(sf_dir: str, k: int = 10):
    """SQL-oracle-checkable phrase top-k (rounded-score rank, nostem)."""
    df = _phrase(sf_dir, AnalyzerConfig(use_stemmer=False), k=None, round_to=4)
    return _topk_rounded(df.drop(columns=["rank"]), k)


def _ensure_norms(idx: str) -> None:
    from .index_build import build_norms

    if not os.path.isdir(os.path.join(idx, "norms")):
        build_norms(idx)


def _vsm(sf_dir: str, cfg: AnalyzerConfig, k: int | None, round_to: int | None):
    import pandas as pd

    from ..state.searcher import LocalSearchEngine

    idx = build_or_get_index(sf_dir, cfg)
    _ensure_norms(idx)
    eng = LocalSearchEngine(idx)
    rows = []
    for qid, q in enumerate(EVAL_QUERIES):
        hits = eng.search_vsm(q, k=k if k is not None else 1 << 30)
        for rank, h in enumerate(hits):
            rows.append(
                (
                    qid,
                    rank,
                    h.conv_id,
                    h.turn_idx,
                    round_half_up(h.score, round_to) if round_to else h.score,
                )
            )
    df = pd.DataFrame(rows, columns=["qid", "rank", "conv_id", "turn_idx", "score"])
    df["qid"] = df["qid"].astype("int64")
    df["rank"] = df["rank"].astype("int64")
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def vsm_all_nostem(sf_dir: str):
    """All OR-matched docs under VSM cosine, stemmer off, scores rounded
    to 4 (SQL-oracle-checkable — norms, integer-division idf and the
    unknown-term query-norm quirk spelled out in SQL)."""
    df = _vsm(sf_dir, AnalyzerConfig(use_stemmer=False), k=None, round_to=4)
    return df.drop(columns=["rank"])


def vsm_topk(sf_dir: str, k: int = 10):
    """Stemmed VSM top-k (pytest-verified vs the oracle; rows-only for
    the driver)."""
    return _vsm(sf_dir, AnalyzerConfig(), k=k, round_to=None)


def vsm_topk_nostem(sf_dir: str, k: int = 10):
    """SQL-oracle-checkable VSM top-k (rounded-score rank, nostem)."""
    df = _vsm(sf_dir, AnalyzerConfig(use_stemmer=False), k=None, round_to=4)
    return _topk_rounded(df.drop(columns=["rank"]), k)


def eval_metrics_nostem(
    sf_dir: str, k_answers: int = 10, k_rel: int = 3, k_judged: int = 6
):
    """SQL-checkable IR-metric pipeline: the BM25 rounded-score top-k
    ranking evaluated against judgments derived from the VSM rounded
    ranking (top ``k_rel`` relevant, next ``k_judged - k_rel`` judged
    irrelevant — exercising AP's skip-unjudged counter and nDCG's
    judged-rank gains + break quirk on NON-trivial inputs, unlike
    ``eval_metrics`` whose self-judgments make every score 1.0).
    Both rankings are the deterministic rounded ones the DuckDB oracle
    provably shares, so (qid, ap, ndcg) is value-exact end to end.
    Returns (qid, ap, ndcg) rounded to 6; AP is NaN when no relevant
    doc was retrieved (the reference's 0/0, themisEval.java:116-150)."""
    import pandas as pd

    from .evaluation import average_precision, doc_id_str, ndcg

    bm = bm25_topk_nostem(sf_dir, k=k_answers)
    vs = vsm_topk_nostem(sf_dir, k=k_judged)
    rows = []
    for qid in sorted(bm["qid"].unique()):
        bq = bm[bm["qid"] == qid].sort_values("rank")
        answers = [
            doc_id_str(c, t)
            for c, t in zip(bq["conv_id"], bq["turn_idx"])
        ]
        vq = vs[vs["qid"] == qid]
        judgments = {
            doc_id_str(c, t): (1 if r < k_rel else 0)
            for c, t, r in zip(vq["conv_id"], vq["turn_idx"], vq["rank"])
        }
        def r6(v: float) -> float:  # NaN passes through (Java 0.0/0.0)
            import math

            return v if math.isnan(v) else float(round_half_up(np.float64(v), 6))

        rows.append(
            {
                "qid": int(qid),
                "ap": r6(average_precision(answers, judgments)),
                "ndcg": r6(ndcg(answers, judgments)),
            }
        )
    return pd.DataFrame(rows)


def existential_all(sf_dir: str):
    """Boolean OR candidates (Existential model), stemmer off — distinct
    (qid, conv_id, turn_idx) matching ≥1 query term, score 1.0."""
    import pandas as pd

    from ..state.searcher import LocalSearchEngine

    idx = build_or_get_index(sf_dir, AnalyzerConfig(use_stemmer=False))
    eng = LocalSearchEngine(idx)
    rows = []
    for qid, q in enumerate(EVAL_QUERIES):
        for h in eng.search_existential(q, k=1 << 30):
            rows.append((qid, h.conv_id, h.turn_idx, h.score))
    df = pd.DataFrame(rows, columns=["qid", "conv_id", "turn_idx", "score"])
    df["qid"] = df["qid"].astype("int64")
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df
