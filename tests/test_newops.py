"""Conversation assembly, incremental dedup, and per-group top-k:
semantics on crafted inputs with pandas references, plus the
scale-path invariants (bucket-count invariance, partial-top-k
combiner == direct selection)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from themis_search_engine_ray.pipelines import conversations, dedup, sampling


def _write_docs(tmp_path, texts, sources=None):
    cols = {
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }
    if sources is not None:
        cols["source"] = pa.array(sources, pa.string())
    pq.write_table(pa.table(cols), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


# ---------------------------------------------------------------- convs


def _conv_reference(texts):
    """Pandas reference of conversation_assemble over the derived
    transcripts (TURNS_PER_CONV docs per conv, role cycles)."""
    from themis_search_engine_ray.sources.transcripts import _ROLES, TURNS_PER_CONV

    rows = []
    for d, t in enumerate(texts):
        rows.append(
            {
                "conv_id": f"conv-{d // TURNS_PER_CONV:08d}",
                "turn_idx": d % TURNS_PER_CONV,
                "role": _ROLES[(d % TURNS_PER_CONV) % len(_ROLES)],
                "text": t or "",
            }
        )
    df = pd.DataFrame(rows).sort_values(["conv_id", "turn_idx"])
    return (
        df.groupby("conv_id")
        .apply(
            lambda g: pd.Series(
                {
                    "n_turns": len(g),
                    "n_chars": int(g["text"].str.len().sum()),
                    "convo": "\n".join(g["role"] + ": " + g["text"]),
                }
            ),
            include_groups=False,
        )
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )


def test_conversation_assemble_matches_reference(ray_session, tmp_path):
    texts = [f"turn number {i} says token{i % 5}" for i in range(19)]
    texts[3] = None  # NULL text renders as an empty line body, 0 chars
    sf = _write_docs(tmp_path, texts)
    got = (
        conversations.conversation_assemble(sf)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    exp = _conv_reference(texts)
    pd.testing.assert_frame_equal(
        got[["conv_id", "n_turns", "n_chars", "convo"]].astype(
            {"n_turns": "int64", "n_chars": "int64"}
        ),
        exp.astype({"n_turns": "int64", "n_chars": "int64"}),
    )
    # the partial last conversation has 19 - 16 = 3 turns
    assert got.set_index("conv_id")["n_turns"]["conv-00000002"] == 3


def test_conversation_assemble_bucket_invariance(ray_session, tmp_path):
    texts = [f"alpha beta {i}" for i in range(40)]
    sf = _write_docs(tmp_path, texts)
    one = (
        conversations.conversation_assemble(sf, n_buckets=1)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    many = (
        conversations.conversation_assemble(sf, n_buckets=7)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)


# ----------------------------------------------------- incremental dedup


def test_incremental_dedup_semantics(ray_session, tmp_path):
    # held rule: md5(str(doc_id))[:4] <= held_hex marks SEEN
    def is_seen(i, held):
        return hashlib.md5(str(i).encode()).hexdigest()[:4] <= held

    held = "7fff"  # ~half the ids
    # a shared pool (mostly ingested already) plus unique new contents
    texts = [f"text {i % 6}" if i % 3 else f"uniq {i}" for i in range(30)]
    sf = _write_docs(tmp_path, texts)
    got = (
        dedup.incremental_dedup(sf, held_hex=held)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # reference: new doc kept iff no seen doc shares its text and it is
    # the min-doc_id new doc for that text
    seen_texts = {texts[i] for i in range(30) if is_seen(i, held)}
    exp_ids = []
    best: dict[str, int] = {}
    for i in range(30):
        if not is_seen(i, held) and texts[i] not in seen_texts:
            best.setdefault(texts[i], i)
    exp_ids = sorted(best.values())
    assert exp_ids, "fixture must keep at least one new doc"
    assert list(got["doc_id"]) == exp_ids
    for _, r in got.iterrows():
        assert r["text_hash"] == hashlib.md5(texts[r["doc_id"]].encode()).hexdigest()


def test_incremental_dedup_all_seen_keeps_nothing(ray_session, tmp_path):
    sf = _write_docs(tmp_path, ["same text"] * 10)
    got = dedup.incremental_dedup(sf, held_hex="ffff").to_pandas()
    assert len(got) == 0


# ---------------------------------------------------------- group top-k


def test_top_per_source_matches_window_reference(ray_session, tmp_path):
    rng = np.random.RandomState(7)
    n = 200
    texts = [" ".join(f"w{j}" for j in range(rng.randint(0, 40))) for _ in range(n)]
    sources = [f"s{rng.randint(0, 4)}" for _ in range(n)]
    sources[5] = None  # NULL source ranks under ""
    sf = _write_docs(tmp_path, texts, sources)
    got = (
        sampling.top_per_source(sf, n=10)
        .to_pandas()
        .sort_values(["source", "rank"])
        .reset_index(drop=True)
    )
    import re

    df = pd.DataFrame(
        {
            "doc_id": range(n),
            "source": [s or "" for s in sources],
            "n_tokens": [len(re.findall("[A-Za-z0-9]+", t)) for t in texts],
        }
    )
    df = df.sort_values(
        ["source", "n_tokens", "doc_id"], ascending=[True, False, True]
    )
    df["rank"] = df.groupby("source").cumcount() + 1
    exp = (
        df[df["rank"] <= 10]
        .sort_values(["source", "rank"])
        .reset_index(drop=True)[["source", "doc_id", "n_tokens", "rank"]]
    )
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "n_tokens": "int64", "rank": "int64"}),
        exp.astype({"doc_id": "int64", "n_tokens": "int64", "rank": "int64"}),
    )


def test_topn_in_order_partial_equals_direct():
    """The per-batch combiner keeps exactly the rows the global
    selection would keep from that batch (top-k is a semilattice:
    topn(topn(A) ∪ topn(B)) == topn(A ∪ B))."""
    rng = np.random.RandomState(3)
    src = rng.randint(0, 5, 500).astype(np.int64)
    toks = rng.randint(0, 30, 500).astype(np.int64)
    ids = np.arange(500, dtype=np.int64)
    keep_all, rank_all = sampling._topn_in_order(src, toks, ids, 7)
    # split into 3 "batches", combine their partials, re-select
    parts = []
    for lo, hi in ((0, 150), (150, 340), (340, 500)):
        k, _ = sampling._topn_in_order(src[lo:hi], toks[lo:hi], ids[lo:hi], 7)
        parts.append(k + lo)
    cand = np.concatenate(parts)
    k2, rank2 = sampling._topn_in_order(src[cand], toks[cand], ids[cand], 7)
    assert sorted(cand[k2]) == sorted(keep_all)
    got = {(int(i), int(r)) for i, r in zip(cand[k2], rank2)}
    exp = {(int(i), int(r)) for i, r in zip(keep_all, rank_all)}
    assert got == exp


def test_conversation_dedup_keeps_min_conv(ray_session, tmp_path):
    from themis_search_engine_ray.sources.transcripts import TURNS_PER_CONV

    n = TURNS_PER_CONV
    # conv 0 and conv 2 identical turn-for-turn; conv 1 differs
    texts = (
        [f"common turn {i}" for i in range(n)]
        + [f"other turn {i}" for i in range(n)]
        + [f"common turn {i}" for i in range(n)]
    )
    sf = _write_docs(tmp_path, texts)
    got = (
        conversations.conversation_dedup(sf)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert list(got["conv_id"]) == ["conv-00000000", "conv-00000001"]
    # hash is of the full rendered transcript (role-and-order aware)
    asm = conversations.conversation_assemble(sf).to_pandas()
    convo0 = asm.set_index("conv_id")["convo"]["conv-00000000"]
    assert (
        got.set_index("conv_id")["conv_hash"]["conv-00000000"]
        == hashlib.md5(convo0.encode()).hexdigest()
    )


def test_source_profile_exact_sums(ray_session, tmp_path):
    from themis_search_engine_ray.pipelines import text_analysis as ta

    texts = ["one two three", "", None, "four 5 six-seven", "a b"]
    sources = ["s1", "s1", None, "s2", "s2"]
    sf = _write_docs(tmp_path, texts, sources)
    got = (
        ta.source_profile(sf)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert list(got["source"]) == ["", "s1", "s2"]
    assert list(got["n_docs"]) == [1, 2, 2]
    # alnum token counts: s1 = 3 + 0, s2 = 4 ("four","5","six","seven") + 2
    assert list(got["total_tokens"]) == [0, 3, 6]
    assert list(got["total_chars"]) == [0, 13, 16 + 3]
    assert got.set_index("source")["mean_tokens"]["s2"] == 3.0
